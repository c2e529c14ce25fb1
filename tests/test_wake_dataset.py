"""Python wake-corpus loader parity with the native loader's semantics."""

import numpy as np

from imagined_speech_translation_tpu.wake.dataset import load_wake_dataset


def _write_corpus(tmp_path, n=3, rows_per=35, avg=7):
    cat = tmp_path / "catalog.csv"
    lines = ["filename,abs,time_rel(sec),extra,mq_type"]
    rng = np.random.default_rng(0)
    for f in range(n):
        event_row = f + 1
        lines.append(f"evt{f},0,{event_row * avg}.0,0,impulse")
        rows = ["abs,time_rel,velocity"]
        for r in range(rows_per + f * avg):  # ragged lengths
            rows.append(f"0,{r},{rng.normal():.4f}")
        (tmp_path / f"evt{f}.csv").write_text("\n".join(rows) + "\n")
    cat.write_text("\n".join(lines) + "\n")
    return tmp_path


def test_load_average_pad_label(tmp_path):
    _write_corpus(tmp_path)
    ds = load_wake_dataset(tmp_path / "catalog.csv", tmp_path)
    assert ds.data.shape[0] == 3
    # longest file: 35 + 2*7 = 49 rows -> 7 averaged rows
    assert ds.seq_len == 7
    assert ds.data.shape[2] == 2
    np.testing.assert_array_equal(ds.labels(), [1, 2, 3])
    # shortest file (35 rows -> 5 averaged) is zero-padded at the tail
    assert np.all(ds.data[0, 5:] == 0)
    # averaging check: time column of first averaged row = mean(0..6) = 3
    assert ds.data[0, 0, 0] == 3.0


def test_shuffle_deterministic(tmp_path):
    _write_corpus(tmp_path)
    ds = load_wake_dataset(tmp_path / "catalog.csv", tmp_path)
    a = ds.shuffled(7)
    b = ds.shuffled(7)
    np.testing.assert_array_equal(a.detection_time, b.detection_time)
    assert set(a.detection_time) == set(ds.detection_time)
