#!/usr/bin/env python3
"""Load benchmark for the synthesis serving endpoint (scripts/serve_synthesis.py).

Drives a running server with N concurrent closed-loop clients for a fixed
duration and reports sustained throughput (requests/s, windows/s) and latency
percentiles (p50/p95/p99), optionally with a mix of TimeGAN and CGAN requests
and a deliberately hung client held open for the whole run (regression guard
for the single-threaded-server failure mode).

The server serializes DEVICE work behind one dispatch lock, so aggregate
throughput is bounded by device time; this benchmark measures what concurrent
CLIENTS see end-to-end (queueing + device + NPZ packing + socket).

Usage:
    python scripts/serve_synthesis.py --runs_dir ... --port 8777 &   # separate
    python scripts/bench_serve.py --port 8777 --clients 4 --seconds 30 \
        --timegan-runs posture1_no_exo,posture2_no_exo [--cgan-models no_exo]
"""

import argparse
import json
import socket
import threading
import time
from http.client import HTTPConnection, HTTPException

import numpy as np


def run_load(host, port, plans, clients, seconds, hold_hung=True):
    """plans: list of (path, body, windows) request templates cycled per client.
    Returns dict with latencies (s), counts, and windows served."""
    stop = time.monotonic() + seconds
    lat, windows, errors = [], [], [0]
    lock = threading.Lock()

    hung = None
    if hold_hung:
        hung = socket.create_connection((host, port), timeout=seconds + 60)
        hung.sendall(b"POST /synthesize HTTP/1.1\r\nHost: x\r\n"
                     b"Content-Length: 999\r\n\r\n")

    def client(i):
        k = i
        while time.monotonic() < stop:
            path, body, nwin = plans[k % len(plans)]
            k += clients
            body = dict(body, seed=k)           # distinct seeds: no dedupe
            t0 = time.monotonic()
            try:
                c = HTTPConnection(host, port, timeout=120)
                c.request("POST", path, body=json.dumps(body))
                r = c.getresponse()
                data = r.read()
                c.close()
                ok = r.status == 200 and len(data) > 0
            except (OSError, HTTPException, ValueError):
                # HTTPException covers malformed/truncated responses
                # (BadStatusLine etc.); ValueError covers bad reads. A broken
                # response must count as an error, not kill the client thread
                # (which would silently skew req/s and the percentiles).
                ok = False
            dt = time.monotonic() - t0
            with lock:
                if ok:
                    lat.append(dt)
                    windows.append(nwin)
                else:
                    errors[0] += 1

    threads = [threading.Thread(target=client, args=(i,)) for i in range(clients)]
    t0 = time.monotonic()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.monotonic() - t0
    if hung is not None:
        hung.close()
    lat_a = np.asarray(lat)
    return {
        "clients": clients,
        "wall_s": round(wall, 2),
        "requests": len(lat),
        "errors": errors[0],
        "req_per_s": round(len(lat) / wall, 2),
        "windows_per_s": round(float(np.sum(windows)) / wall, 1),
        "p50_ms": round(float(np.percentile(lat_a, 50)) * 1e3, 1) if len(lat) else None,
        "p95_ms": round(float(np.percentile(lat_a, 95)) * 1e3, 1) if len(lat) else None,
        "p99_ms": round(float(np.percentile(lat_a, 99)) * 1e3, 1) if len(lat) else None,
        "max_ms": round(float(lat_a.max()) * 1e3, 1) if len(lat) else None,
    }


def main():
    ap = argparse.ArgumentParser(formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    ap.add_argument("--host", type=str, default="127.0.0.1")
    ap.add_argument("--port", type=int, required=True)
    ap.add_argument("--clients", type=int, default=4)
    ap.add_argument("--seconds", type=float, default=30.0)
    ap.add_argument("--n", type=int, default=64, help="windows per request")
    ap.add_argument("--seq-len", type=int, default=768)
    ap.add_argument("--timegan-runs", type=str, default="",
                    help="comma-separated run names to cycle through")
    ap.add_argument("--cgan-models", type=str, default="",
                    help="comma-separated CGAN tags to mix in")
    ap.add_argument("--no-hung-client", action="store_true",
                    help="skip holding a dead half-open request during the run")
    ap.add_argument("--json-out", type=str, default="")
    args = ap.parse_args()

    plans = []
    for run in filter(None, args.timegan_runs.split(",")):
        plans.append(("/synthesize",
                      {"run": run, "n": args.n, "seq_len": args.seq_len},
                      args.n))
    for tag in filter(None, args.cgan_models.split(",")):
        plans.append(("/synthesize_cgan",
                      {"model": tag, "label": 0, "n": args.n}, args.n))
    if not plans:
        raise SystemExit("give at least one of --timegan-runs / --cgan-models")

    # warm every plan once (compiles) before the timed window
    for path, body, _ in plans:
        c = HTTPConnection(args.host, args.port, timeout=600)
        c.request("POST", path, body=json.dumps(dict(body, seed=0)))
        r = c.getresponse()
        r.read()
        c.close()
        print(f"[bench_serve] warmed {path} {body.get('run') or body.get('model')}"
              f" -> {r.status}", flush=True)

    out = run_load(args.host, args.port, plans, args.clients, args.seconds,
                   hold_hung=not args.no_hung_client)
    print(json.dumps(out))
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
