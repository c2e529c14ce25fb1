"""Synthetic Chisco-layout corpus + montage for tests and benchmarks.

The real data is a 224-file OpenNeuro download (``main_model/data/dataset.sh``)
that cannot be assumed present; this generates pickles with the exact on-disk
layout the reference consumes: each file a list of
``{'input_features': (1, 125, T) float32, 'text': str}`` dicts
(SURVEY.md §4 test-strategy item (c)).
"""

from __future__ import annotations

import pickle
from pathlib import Path

import numpy as np

from .regions import ELECTRODE_REGIONS

DEFAULT_TEXTS = (
    "我想喝水",
    "请帮我打开窗户",
    "今天天气很好",
    "我需要休息一下",
    "谢谢你的帮助",
    "我们去公园散步",
    "请把音乐关掉",
    "晚饭吃什么",
)


def make_synthetic_montage(path: str | Path, n_channels: int = 125) -> list[str]:
    """Write a montage CSV whose ``label`` column contains the 48 mapped
    electrodes (interleaved among filler channels, mimicking the real montage
    where 48/125 rows map to regions)."""
    mapped = [ch for region in ELECTRODE_REGIONS.values() for ch in region]
    labels = []
    fill = 0
    rng = np.random.default_rng(0)
    positions = sorted(rng.choice(n_channels, size=len(mapped), replace=False))
    mapped_iter = iter(mapped)
    for i in range(n_channels):
        if positions and i == positions[0]:
            positions = positions[1:]
            labels.append(next(mapped_iter))
        else:
            labels.append(f"AUX{fill}")
            fill += 1
    lines = ["label,x,y,z"]
    for i, lab in enumerate(labels):
        lines.append(f"{lab},{i * 0.01:.3f},0.0,0.0")
    Path(path).write_text("\n".join(lines) + "\n")
    return labels


def make_synthetic_corpus(
    data_dir: str | Path,
    *,
    n_files: int = 3,
    samples_per_file: int = 4,
    n_channels: int = 125,
    n_timepoints: int = 256,
    texts=DEFAULT_TEXTS,
    seed: int = 0,
    class_conditioned: bool = False,
    noise_scale: float = 1.0,
) -> list[Path]:
    """Write pickle files; EEG is band-limited noise with per-channel offsets
    so robust scaling is non-trivial.

    ``class_conditioned=True`` makes the EEG *decodable*: each text gets a
    fixed per-channel oscillatory signature (distinct frequency/phase mix)
    that is added under the noise, so a model can generalize text from
    held-out windows — the training-proof corpus (imagined-speech stand-in
    with a learnable signal, unlike the pure-noise default).
    """
    out_dir = Path(data_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    t = np.arange(n_timepoints) / 256.0
    signatures = {}
    if class_conditioned:
        sig_rng = np.random.default_rng(seed + 1)
        for k_text, text in enumerate(texts):
            freqs = sig_rng.uniform(2.0, 40.0, (n_channels, 3))
            phases = sig_rng.uniform(0, 2 * np.pi, (n_channels, 3))
            amps = sig_rng.uniform(0.5, 2.0, (n_channels, 3))
            signatures[text] = (
                amps[:, :, None]
                * np.sin(2 * np.pi * freqs[:, :, None] * t + phases[:, :, None])
            ).sum(axis=1)[None]  # (1, C, T)
    paths = []
    k = 0
    for f in range(n_files):
        samples = []
        for _ in range(samples_per_file):
            text = texts[k % len(texts)]
            base = rng.normal(0, noise_scale, (1, n_channels, n_timepoints))
            drift = rng.normal(0, 5, (1, n_channels, 1))
            scalep = rng.uniform(0.5, 3.0, (1, n_channels, 1))
            eeg = base * scalep + drift
            if class_conditioned:
                eeg = eeg + 3.0 * scalep * signatures[text]
            samples.append(
                {
                    "input_features": eeg.astype(np.float32),
                    "text": text,
                }
            )
            k += 1
        p = out_dir / f"sub-0{f + 1}_task-imagine_run-1.pkl"
        with open(p, "wb") as fh:
            pickle.dump(samples, fh)
        paths.append(p)
    return paths
