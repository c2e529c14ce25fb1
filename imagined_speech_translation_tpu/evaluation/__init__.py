"""Chinese text-generation evaluation (reference:
``main_model/src/evaluation/evaluator.py``)."""

from .evaluator import ChineseEvaluator, prediction_diversity  # noqa: F401
