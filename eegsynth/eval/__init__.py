"""Evaluation suite: discriminative/predictive scores, statistical similarity,
PCA/t-SNE figures — the TPU rebuild of timeGAN/evaluation.py, evaluate_18.py and
the CGAN eval family."""

from eegsynth.eval.stats import statistical_similarity  # noqa: F401
from eegsynth.eval.classifiers import discriminative_score, predictive_score  # noqa: F401
