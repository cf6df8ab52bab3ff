"""Preprocessing pipeline tests: synthetic CSVs end-to-end + unit pieces."""

import numpy as np
import pytest

from eegsynth.data.preprocess import (
    discover_csvs, find_time_col, match_epoc_columns, parse_meta_from_name,
    run_preprocess,
)
from eegsynth import EPOC_CHANNELS


def test_match_epoc_columns_variants():
    cols = ["index", "timestamp"] + [f"eeg.{c.lower()}" for c in EPOC_CHANNELS]
    assert match_epoc_columns(cols) == [f"eeg.{c.lower()}" for c in EPOC_CHANNELS]
    cols2 = ["AF3", "f7 (uv)", "eeg.f3", "FC5_uv".lower()]
    got = match_epoc_columns(cols2)
    assert got == ["AF3", "f7 (uv)", "eeg.f3", "fc5_uv"]


def test_parse_meta_from_name():
    p, c, t = parse_meta_from_name(
        "Posture-3-con-1-deep squatting-fatigue-no exo-08 Aug_EPOC_451532_trial2.csv")
    assert (p, c, t) == (3, "no_exo", 2)
    p, c, t = parse_meta_from_name("posture-7-x-with exo-_trial11.csv")
    assert (p, c, t) == (7, "with_exo", 11)
    assert parse_meta_from_name("rest-1.csv") == (None, None, None)


def test_find_time_col():
    assert find_time_col(["index", "Timestamp", "eeg.af3"]) == "Timestamp"
    assert find_time_col(["Counter", "eeg.af3"]) == "Counter"
    assert find_time_col(["eeg.af3"]) is None


def _write_csv(path, fs=128.0, seconds=14.0, posture=1, cond="no exo", trial=1,
               mains=60.0):
    rng = np.random.default_rng(posture * 10 + trial)
    n = int(fs * seconds)
    t = np.arange(n) / fs + 1e-6 * rng.standard_normal(n)
    data = {"timestamp": t}
    sig = rng.standard_normal((n, 14)).cumsum(axis=0) * 0.1
    sig += 2.0 * np.sin(2 * np.pi * mains * np.arange(n) / fs)[:, None]
    for i, ch in enumerate(EPOC_CHANNELS):
        data[f"eeg.{ch.lower()}"] = 4000 + sig[:, i]
    import pandas as pd
    name = (f"Posture-{posture}-con-1-task-fatigue-{cond}-xx_EPOCPLUS_1_"
            f"20250808_000000_trial{trial}.csv")
    pd.DataFrame(data).to_csv(path / name, index=False)


def test_run_preprocess_end_to_end(tmp_path):
    root = tmp_path / "6s_window"
    for part in (1, 2):
        d = root / f"protocol_outputs_{part}"
        d.mkdir(parents=True)
        _write_csv(d, posture=1, cond="no exo", trial=part)
        _write_csv(d, posture=1, cond="with exo", trial=part)
        _write_csv(d, posture=2, cond="no exo", trial=part)
    # a rest file and a broken file must be skipped
    (root / "protocol_outputs_1" / "Posture-1-...rest1.csv").write_text("a,b\n1,2\n")
    (root / "protocol_outputs_1" / "Posture-9-con-1-x-no exo-trial1.csv").write_text(
        "timestamp,eeg.af3\n" + "\n".join(f"{i/128},{i}" for i in range(900)))

    out = tmp_path / "preprocessed"
    rows = run_preprocess(root, out, log=lambda *a, **k: None)

    assert {(r["posture"], r["condition"]) for r in rows} == {
        (1, "no_exo"), (1, "with_exo"), (2, "no_exo")}
    from eegsynth.data.io import load_bucket
    b = load_bucket(out / "posture1_no_exo.npz")
    # 14 s at 128 Hz = 1792 samples → 2 fixed 768-sample epochs per file × 2 participants
    assert b.X.shape == (4, 768, 14)
    assert b.X.dtype == np.float32
    assert np.nanmin(b.X) >= 0.0 and np.nanmax(b.X) <= 1.0 + 1e-6
    assert b.ch_names == [f"eeg.{c.lower()}" for c in EPOC_CHANNELS]
    assert sorted(b.participant.tolist()) == [1, 1, 2, 2]
    assert b.epoch_len_samples == 768
    assert (out / "prep_index.csv").exists()
    # scalers invert back to filtered-signal scale
    from eegsynth.data.scaling import minmax_invert
    X_orig = minmax_invert(b.X, b.scale_min, b.scale_range)
    assert np.abs(X_orig).max() > 0.5  # not in [0,1] anymore


def test_run_preprocess_dry_run(tmp_path):
    root = tmp_path / "w"
    d = root / "protocol_outputs_1"
    d.mkdir(parents=True)
    _write_csv(d)
    out = tmp_path / "o"
    rows = run_preprocess(root, out, dry_run=True, log=lambda *a, **k: None)
    assert rows == []
    assert not (out / "prep_index.csv").exists()


def test_run_preprocess_skips_channel_count_mismatch(tmp_path):
    """A file matching a different channel COUNT than its bucket cannot
    concatenate (the reference would crash the whole run at save time) —
    it must be skipped like the other defensive SKIPs, keeping the rest."""
    import pandas as pd

    root = tmp_path / "6s_window"
    d = root / "protocol_outputs_1"
    d.mkdir(parents=True)
    _write_csv(d, posture=1, cond="no exo", trial=1)      # all 14 channels
    rng_ = np.random.default_rng(0)
    n = int(128 * 14.0)
    data = {"timestamp": np.arange(n) / 128}
    for ch in EPOC_CHANNELS[:10]:                          # only 10 channels
        data[f"eeg.{ch.lower()}"] = 4000 + rng_.standard_normal(n)
    pd.DataFrame(data).to_csv(
        d / ("Posture-1-con-1-task-fatigue-no exo-xx_EPOCPLUS_1_"
             "20250808_000001_trial2.csv"), index=False)

    out = tmp_path / "pre"
    rows = run_preprocess(root, out, log=lambda *a, **k: None)
    assert {(r["posture"], r["condition"]) for r in rows} == {(1, "no_exo")}
    b = np.load(out / "posture1_no_exo.npz", allow_pickle=True)
    assert b["X"].shape[2] == 14          # only the 14-channel trial remains
    assert set(np.asarray(b["trial"]).tolist()) == {1}
