"""Classifier training + (defended) accuracy evaluation.

Reference parity: cleverhans model_train / model_eval as used by whitebox.py
and blackbox.py, plus utils/gan_defense.py::model_eval_gan of
kabkabm/defensegan.
"""

from defensegan_tpu.eval.classifier import (ClassifierState, make_logits_fn,
                                            train_classifier)
from defensegan_tpu.eval.accuracy import model_eval, model_eval_gan
from defensegan_tpu.eval.detect import (bootstrap_auc_ci, calibration_sweep,
                                        combined_scores, detection_features,
                                        ecdf_atypicality,
                                        multi_feature_scores,
                                        reconstruction_errors,
                                        restart_dispersion, roc_auc,
                                        roc_points, tpr_at_fpr,
                                        two_sided_scores,
                                        undetected_success_rate)
from defensegan_tpu.eval.quality import BF16_TIE_TAU, tie_aware_disagreement

__all__ = [
    "bootstrap_auc_ci",
    "calibration_sweep",
    "combined_scores",
    "detection_features",
    "ecdf_atypicality",
    "multi_feature_scores",
    "reconstruction_errors",
    "restart_dispersion",
    "roc_auc",
    "roc_points",
    "tpr_at_fpr",
    "two_sided_scores",
    "undetected_success_rate",
    "ClassifierState",
    "make_logits_fn",
    "train_classifier",
    "model_eval",
    "model_eval_gan",
    "tie_aware_disagreement",
    "BF16_TIE_TAU",
]
