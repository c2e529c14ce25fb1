"""Evaluator tests: reference-numerics BLEU/ROUGE (library path) and the
self-contained fallback implementations cross-checked against the libraries."""

import numpy as np
import pytest

from imagined_speech_translation_tpu.evaluation import (
    ChineseEvaluator,
    prediction_diversity,
)
from imagined_speech_translation_tpu.evaluation import evaluator as ev_mod


def test_perfect_predictions():
    ev = ChineseEvaluator()
    preds = ["我想喝水", "今天天气很好"]
    m = ev.compute_all_metrics(preds, list(preds))
    assert m["bleu_1"] == pytest.approx(100.0, abs=1e-6)
    assert m["exact_match"] == 100.0
    assert m["rouge_l_f"] == pytest.approx(100.0, abs=1e-6)
    assert m["token_f1"] == pytest.approx(100.0, abs=1e-6)
    assert m["length_ratio"] == pytest.approx(1.0)


def test_disjoint_predictions():
    ev = ChineseEvaluator()
    m = ev.compute_all_metrics(["我想喝水"], ["晚饭吃什么"])
    assert m["bleu_4"] <= m["bleu_1"] < 30.0
    assert m["exact_match"] == 0.0
    assert m["token_f1"] == 0.0
    assert m["rouge_l_f"] == 0.0


def test_empty_and_mismatched_inputs():
    ev = ChineseEvaluator()
    assert ev.compute_all_metrics([], [])["bleu_1"] == 0.0
    assert ev.compute_all_metrics(["a"], ["a", "b"])["total_pairs"] == 0
    m = ev.compute_all_metrics(["", " "], ["x", "y"])
    assert m["valid_pairs"] == 0


def test_fallback_bleu_matches_nltk():
    nltk = pytest.importorskip("nltk")
    from nltk.translate.bleu_score import SmoothingFunction, sentence_bleu

    rng = np.random.default_rng(0)
    smooth = SmoothingFunction().method1
    for trial in range(20):
        ref = [str(x) for x in rng.integers(0, 6, rng.integers(2, 10))]
        pred = [str(x) for x in rng.integers(0, 6, rng.integers(2, 10))]
        for n, w in ev_mod._BLEU_WEIGHTS.items():
            want = sentence_bleu([ref], pred, weights=w, smoothing_function=smooth)
            got = ev_mod._bleu_method1(ref, pred, w)
            assert got == pytest.approx(want, abs=1e-9), (trial, n, ref, pred)


def test_fallback_rouge_matches_rouge_score():
    rs = pytest.importorskip("rouge_score")
    from rouge_score import rouge_scorer

    scorer = rouge_scorer.RougeScorer(["rouge1", "rouge2", "rougeL"], use_stemmer=False)
    rng = np.random.default_rng(1)
    for _ in range(20):
        ref = [f"t{x}" for x in rng.integers(0, 6, rng.integers(2, 10))]
        pred = [f"t{x}" for x in rng.integers(0, 6, rng.integers(2, 10))]
        want = scorer.score(" ".join(ref), " ".join(pred))
        assert ev_mod._rouge_n_f(ref, pred, 1) == pytest.approx(
            want["rouge1"].fmeasure, abs=1e-9
        )
        assert ev_mod._rouge_n_f(ref, pred, 2) == pytest.approx(
            want["rouge2"].fmeasure, abs=1e-9
        )
        assert ev_mod._rouge_l_f(ref, pred) == pytest.approx(
            want["rougeL"].fmeasure, abs=1e-9
        )


def test_prediction_diversity():
    d = prediction_diversity(["a", "a", "a", "b"])
    assert d["diversity_score"] == 0.5
    assert not d["is_repetitive"]
    d2 = prediction_diversity(["a"] * 10)
    assert d2["is_repetitive"]
    d3 = prediction_diversity([])
    assert d3["is_repetitive"] and d3["diversity_score"] == 0.0


def test_char_tokenize_fallback():
    ev = ChineseEvaluator()
    # direct call of the char-level fallback
    toks = ChineseEvaluator.tokenize.__wrapped__(ev, "hello 我想喝water") if hasattr(
        ChineseEvaluator.tokenize, "__wrapped__"
    ) else None
    # jieba path sanity
    assert "".join(ev.tokenize("我想喝水")) == "我想喝水"
