"""Evaluation suite."""

from chessvision_tpu.eval.evaluate import evaluate_model

__all__ = ["evaluate_model"]
