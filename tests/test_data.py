"""Data-plane tests: region mapping, scaler parity vs sklearn, tokenizer
parity vs HF BertTokenizer, dataset pipeline, batching/prefetch."""

import numpy as np
import pytest

from imagined_speech_translation_tpu.config import DataConfig, AugmentationConfig
from imagined_speech_translation_tpu.data import (
    ChineseCharTokenizer,
    ChiscoCorpus,
    EEGTextDataset,
    RegionSpec,
    batch_iterator,
    build_region_indices,
    device_prefetch,
    make_synthetic_corpus,
    make_synthetic_montage,
    split_indices,
)
from imagined_speech_translation_tpu.data.chisco import clean_eeg, validate_sample
from imagined_speech_translation_tpu.data.regions import ELECTRODE_REGIONS, load_montage
from imagined_speech_translation_tpu.data.scaler import RegionRobustScaler

# ---------------------------------------------------------------------------
# fixtures
# ---------------------------------------------------------------------------

TINY_VOCAB = (
    ["[PAD]"]
    + [f"[unused{i}]" for i in range(99)]
    + ["[UNK]", "[CLS]", "[SEP]", "[MASK]", "[EOS]"]
    + list("我想喝水请帮打开窗户今天气很好需要休息一下谢的助们去公园散步把音乐关掉晚饭吃什么数据样本")
    + ["hello", "##llo", "he", "world", ",", "。"]
)


def tiny_tokenizer():
    # ids: PAD=0, UNK=100, CLS=101, SEP=102, MASK=103, EOS=104 — mirrors the
    # fnlp/bart-base-chinese key ids (pad=0, bos=101, eos=104).
    vocab = list(dict.fromkeys(TINY_VOCAB))
    tok = ChineseCharTokenizer(vocab, unk_token="[UNK]", eos_token="[EOS]")
    assert tok.pad_token_id == 0 and tok.bos_token_id == 101
    return tok


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("chisco")
    make_synthetic_corpus(d / "data", n_files=3, samples_per_file=4, n_timepoints=256)
    make_synthetic_montage(d / "montage.csv")
    return d


# ---------------------------------------------------------------------------
# regions
# ---------------------------------------------------------------------------


def test_region_counts_match_reference():
    counts = {r: len(v) for r, v in ELECTRODE_REGIONS.items()}
    assert counts == {"frontal": 16, "temporal": 9, "central": 11, "parietal": 12}
    assert sum(counts.values()) == 48


def test_region_spec_stack_roundtrip(corpus_dir):
    labels = load_montage(corpus_dir / "montage.csv")
    spec = RegionSpec.from_channel_names(labels)
    assert spec.counts == (16, 9, 11, 12)
    assert spec.max_channels == 16
    eeg = np.random.default_rng(0).normal(size=(125, 64)).astype(np.float32)
    stacked = spec.stack(eeg)
    assert stacked.shape == (4, 16, 64)
    # padded slots are exactly zero
    assert np.all(stacked[~spec.channel_mask] == 0)
    # unstack recovers the ragged regions
    regions = spec.split(stacked)
    idx = build_region_indices(labels)
    for r, name in enumerate(spec.region_names):
        np.testing.assert_array_equal(regions[r], eeg[idx[name]])


# ---------------------------------------------------------------------------
# scaler parity vs sklearn
# ---------------------------------------------------------------------------


def test_robust_scaler_matches_sklearn():
    from sklearn.preprocessing import RobustScaler

    rng = np.random.default_rng(1)
    n, r, c, t = 7, 4, 16, 50
    mask = np.zeros((r, c), bool)
    for i, cnt in enumerate((16, 9, 11, 12)):
        mask[i, :cnt] = True
    samples = rng.normal(2.0, 3.0, (n, r, c, t)).astype(np.float32)
    samples = np.where(mask[None, :, :, None], samples, 0.0)

    ours = RegionRobustScaler(quantile_range=(5.0, 95.0)).fit(samples, mask)
    out = ours.transform(samples[0])

    for ri in range(r):
        cnt = int(mask[ri].sum())
        # reference fit distribution: (N*T, C) observations per region
        obs = np.moveaxis(samples[:, ri, :cnt, :], 0, 1).reshape(cnt, n * t).T
        sk = RobustScaler(quantile_range=(5.0, 95.0)).fit(obs)
        np.testing.assert_allclose(ours.center_[ri, :cnt], sk.center_, rtol=1e-5)
        np.testing.assert_allclose(ours.scale_[ri, :cnt], sk.scale_, rtol=1e-5)
        ref = sk.transform(samples[0, ri, :cnt].T).T
        np.testing.assert_allclose(out[ri, :cnt], ref, rtol=1e-4, atol=1e-5)


def test_scaler_zero_scale_channels():
    mask = np.ones((1, 2), bool)
    samples = np.zeros((3, 1, 2, 10), np.float32)
    samples[:, 0, 1] = 5.0  # constant nonzero channel
    sc = RegionRobustScaler().fit(samples, mask)
    out = sc.transform(samples[0])
    assert np.isfinite(out).all()
    np.testing.assert_allclose(sc.scale_[0], [1.0, 1.0])


def test_scaler_save_load(tmp_path):
    mask = np.ones((2, 3), bool)
    samples = np.random.default_rng(0).normal(size=(4, 2, 3, 8)).astype(np.float32)
    sc = RegionRobustScaler().fit(samples, mask)
    sc.save(tmp_path / "sc.json")
    sc2 = RegionRobustScaler.load(tmp_path / "sc.json")
    np.testing.assert_allclose(sc.transform(samples[1]), sc2.transform(samples[1]))


# ---------------------------------------------------------------------------
# tokenizer parity vs HF BertTokenizer
# ---------------------------------------------------------------------------


def test_tokenizer_matches_hf_bert(tmp_path):
    transformers = pytest.importorskip("transformers")
    vocab = list(dict.fromkeys(TINY_VOCAB))
    vf = tmp_path / "vocab.txt"
    vf.write_text("\n".join(vocab) + "\n", encoding="utf-8")
    hf = transformers.BertTokenizer(str(vf), do_lower_case=True)
    ours = ChineseCharTokenizer(vocab, eos_token="[EOS]")

    texts = [
        "我想喝水",
        "请帮我打开窗户",
        "hello world",
        "Hello, 我想喝水。",
        "unknownword 喝水",
        "",
    ]
    for text in texts:
        if not text:
            continue
        assert ours.tokenize(text) == hf.tokenize(text), text
        enc = hf(
            text, max_length=16, padding="max_length", truncation=True,
            add_special_tokens=True,
        )
        got = ours.encode(text, max_length=16)
        assert got["input_ids"].tolist() == enc["input_ids"], text
        assert got["attention_mask"].tolist() == enc["attention_mask"], text


def test_encode_for_seq2seq_semantics():
    tok = tiny_tokenizer()
    out = tok.encode_for_seq2seq("我想喝水", max_length=8)
    ids = tok.encode("我想喝水", max_length=8)["input_ids"]
    # decoder input = [bos] + input_ids[:-1] (reference dataset.py:470-473)
    assert out["decoder_input_ids"][0] == tok.bos_token_id
    np.testing.assert_array_equal(out["decoder_input_ids"][1:], ids[:-1])
    # labels: pad -> -100
    assert (out["labels"][ids == tok.pad_token_id] == -100).all()
    # empty text falls back to the reference default text
    out2 = tok.encode_for_seq2seq("", max_length=8)
    assert out2["attention_mask"].sum() > 2


def test_tokenizer_decode_roundtrip():
    tok = tiny_tokenizer()
    enc = tok.encode("我想喝水", max_length=16)
    assert tok.decode(enc["input_ids"]) == "我想喝水"


# ---------------------------------------------------------------------------
# corpus + dataset
# ---------------------------------------------------------------------------


def test_corpus_index_and_validation(corpus_dir):
    corpus = ChiscoCorpus(corpus_dir / "data")
    assert len(corpus) == 12
    s = corpus.get(0)
    assert validate_sample(s)
    assert clean_eeg(s["input_features"]).shape == (125, 256)
    assert corpus.get(999) is None


def test_validate_sample_rejects_bad_shapes():
    assert not validate_sample({"input_features": np.zeros((1, 64, 10)), "text": "x"})
    assert not validate_sample({"text": "x"})
    assert not validate_sample([1, 2, 3])
    assert validate_sample({"input_features": np.zeros((1, 125, 10)), "text": "x"})


def test_dataset_end_to_end(corpus_dir):
    cfg = DataConfig(n_timepoints=256, max_length=12)
    ds = EEGTextDataset(
        str(corpus_dir / "data"),
        str(corpus_dir / "montage.csv"),
        tiny_tokenizer(),
        cfg,
        augment=False,
        seed=42,
    )
    assert len(ds) == 12
    ex = ds.get(0)
    assert ex.eeg.shape == (4, 16, 256)
    assert ex.decoder_input_ids.shape == (12,)
    assert np.isfinite(ex.eeg).all()
    # padded channel slots stay zero post-normalization
    assert np.all(ex.eeg[~ds.region_spec.channel_mask] == 0)
    # deterministic
    ex2 = ds.get(0)
    np.testing.assert_array_equal(ex.eeg, ex2.eeg)


def test_dataset_augmentation_reproducible(corpus_dir):
    cfg = DataConfig(n_timepoints=256, max_length=12)
    ds = EEGTextDataset(
        str(corpus_dir / "data"), str(corpus_dir / "montage.csv"),
        tiny_tokenizer(), cfg, augment=True, seed=42,
    )
    a = ds.get(1, epoch=0).eeg
    b = ds.get(1, epoch=0).eeg
    c = ds.get(1, epoch=1).eeg
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)  # different epoch -> different augmentation
    assert np.all(a[~ds.region_spec.channel_mask] == 0)


def test_split_indices_disjoint():
    tr, va, te = split_indices(100, (0.8, 0.1, 0.1), seed=42)
    assert len(tr) == 80 and len(va) == 10 and len(te) == 10
    assert len(set(tr) | set(va) | set(te)) == 100
    tr2, _, _ = split_indices(100, (0.8, 0.1, 0.1), seed=42)
    np.testing.assert_array_equal(tr, tr2)


def test_batch_iterator_and_prefetch(corpus_dir):
    cfg = DataConfig(n_timepoints=256, max_length=12)
    ds = EEGTextDataset(
        str(corpus_dir / "data"), str(corpus_dir / "montage.csv"),
        tiny_tokenizer(), cfg, augment=False, seed=42,
    )
    batches = list(batch_iterator(ds, np.arange(10), 4, shuffle=True, seed=1))
    assert len(batches) == 2  # drop_last
    assert batches[0]["eeg"].shape == (4, 4, 16, 256)
    assert batches[0]["labels"].shape == (4, 12)

    fed = list(device_prefetch(batch_iterator(ds, np.arange(10), 4), size=2))
    assert len(fed) == 2
    import jax

    assert isinstance(fed[0]["eeg"], jax.Array)


def test_relational_corpus_class_coding(tmp_path):
    """The ablation-sweep corpus mode: classes come in pairs sharing one
    local signature — region-LOCAL statistics are pair-invariant
    (spectra shared, absolute relational phase randomized per sample) and
    only BETWEEN-region phase offsets separate a pair's members, so a
    region-local model ceilings at pair identification while integrating
    architectures can fully separate (tools/ablation_sweep.py relies on
    this structural margin)."""
    import collections
    import pickle

    from imagined_speech_translation_tpu.data.synthetic import DEFAULT_TEXTS

    labels = make_synthetic_montage(tmp_path / "montage.csv")
    paths = make_synthetic_corpus(
        tmp_path / "data", n_files=8, samples_per_file=16,
        n_timepoints=256, seed=3, class_conditioned="relational",
        noise_scale=0.05, montage_labels=labels,
    )
    by_text = collections.defaultdict(list)
    for p in paths:
        with open(p, "rb") as fh:
            for s in pickle.load(fh):
                by_text[s["text"]].append(s["input_features"][0])
    # two mapped channels from different regions
    regions = list(ELECTRODE_REGIONS.values())
    c_a = labels.index(regions[0][0])
    c_b = labels.index(regions[2][0])
    texts = list(DEFAULT_TEXTS)  # pair p = (texts[2p], texts[2p+1])

    def phase_stats(arrs, chan):
        # phase at the dominant RELATIONAL bin (integer 4..30 Hz on the
        # 1-s window; the pair signatures live in 31..60 Hz), per sample
        sp = np.fft.rfft(np.stack([a[chan] for a in arrs]), axis=-1)
        band = np.abs(sp).mean(axis=0)[4:31]
        k = band.argmax() + 4
        return np.angle(sp[:, k])

    # (a) absolute relational phase within one region is uninformative:
    # the random per-sample global phase spreads it around the circle,
    # so no single-region feature separates a pair's members
    for t in texts[:3]:
        ph = phase_stats(by_text[t], c_a)
        assert np.abs(np.exp(1j * ph).mean()) < 0.5, "absolute phase leaks"
    # (b) the BETWEEN-region phase difference is tight within a class and
    # differs between the two members of each pair
    diffs = {}
    for t in texts:
        pa = phase_stats(by_text[t], c_a)
        pb = phase_stats(by_text[t], c_b)
        d = np.exp(1j * (pa - pb))
        conc = np.abs(d.mean())  # circular concentration, 1 = identical
        assert conc > 0.95, f"within-class phase diff not tight: {conc}"
        diffs[t] = np.angle(d.mean())
    for p in range(len(texts) // 2):
        a, b = diffs[texts[2 * p]], diffs[texts[2 * p + 1]]
        sep = np.abs(np.angle(np.exp(1j * (a - b))))
        assert sep > 0.1, f"pair {p} not phase-separated: {sep}"
    # (c) per-channel amplitude spectra are PAIR-invariant: the only
    # local difference between pair members is below the noise floor
    def mean_spec(arrs, chan):
        # per-sample norm removes the random per-channel scale multiplier
        # exactly, so the comparison is of spectral SHAPE
        sp = np.abs(np.fft.rfft(np.stack([a[chan] for a in arrs]), axis=-1))
        sp = sp[:, 1:]  # drop DC: the random per-sample drift offset
        return (sp / np.linalg.norm(sp, axis=-1, keepdims=True)).mean(axis=0)

    s0 = mean_spec(by_text[texts[0]], c_a)
    s1 = mean_spec(by_text[texts[1]], c_a)
    cos = (s0 * s1).sum() / (np.linalg.norm(s0) * np.linalg.norm(s1))
    assert cos > 0.99, f"intra-pair spectra leak local information: {cos}"
    # …while DIFFERENT pairs are locally separable (the CNN's signal)
    s2 = mean_spec(by_text[texts[2]], c_a)
    cos2 = (s0 * s2).sum() / (np.linalg.norm(s0) * np.linalg.norm(s2))
    assert cos2 < cos, "pair signatures should differ across pairs"


def test_coupled_corpus_class_coding(tmp_path):
    """The coupled ablation corpus's information structure (synthetic.py
    ``class_conditioned="coupled"``): the pair-member bit must be (a) at
    chance for region-local spectral features, (b) at chance for the uniform
    region mix (the 2v2 in/anti-phase split cancels every linear region
    mix), and (c) near-perfectly decodable from cross-region slot
    coincidences (the quantity the fusion/attention stack under ablation
    integrates)."""
    import pickle

    from imagined_speech_translation_tpu.data.regions import ELECTRODE_REGIONS
    from imagined_speech_translation_tpu.data.synthetic import (
        DEFAULT_TEXTS,
        make_synthetic_corpus,
        make_synthetic_montage,
    )

    T = 256
    labels = make_synthetic_montage(tmp_path / "m.csv")
    paths = make_synthetic_corpus(
        tmp_path / "data", n_files=4, samples_per_file=96, n_timepoints=T,
        class_conditioned="coupled", montage_labels=labels, seed=3,
    )
    samples = [s for p in paths for s in pickle.load(open(p, "rb"))]
    X = np.stack([s["input_features"][0] for s in samples])
    y = np.array([DEFAULT_TEXTS.index(s["text"]) for s in samples])
    region_of = np.full(X.shape[1], -1)
    for r, (_, mem) in enumerate(ELECTRODE_REGIONS.items()):
        m = set(mem)
        for c, lab in enumerate(labels):
            if lab in m:
                region_of[c] = r
    R = np.stack([X[:, region_of == r].mean(1) for r in range(4)], 1)
    n_slots, sl = 4, T // 8
    starts = [(2 * j + 1) * T // 8 - sl // 2 for j in range(n_slots)]
    pair, member = y // 2, y % 2

    def centroid_acc(feats, yy):
        n = len(yy)
        idx = np.random.default_rng(0).permutation(n)
        tr, te = idx[: n // 2], idx[n // 2:]
        mu, sd = feats[tr].mean(0), feats[tr].std(0) + 1e-9
        f = (feats - mu) / sd
        cents = np.stack(
            [f[tr][yy[tr] == k].mean(0) for k in range(yy.max() + 1)]
        )
        pred = np.argmin(((f[te][:, None] - cents[None]) ** 2).sum(-1), 1)
        return (pred == yy[te]).mean()

    def per_pair(feats, thresh, op):
        for p_ in range(4):
            m = pair == p_
            a = centroid_acc(feats[m], member[m])
            assert op(a, thresh), f"pair {p_}: acc {a} vs {thresh}"

    loc = np.concatenate(
        [np.abs(np.fft.rfft(R[:, :, s0:s0 + sl], axis=-1)).reshape(len(y), -1)
         for s0 in starts], 1,
    )
    per_pair(loc, 0.72, lambda a, t: a <= t)  # (a) local ~ chance
    assert centroid_acc(loc, pair) > 0.9      # ...but pair is easy locally

    mix = R.mean(1)
    mixf = np.concatenate(
        [np.abs(np.fft.rfft(mix[:, s0:s0 + sl], axis=-1)) for s0 in starts], 1
    )
    per_pair(mixf, 0.72, lambda a, t: a <= t)  # (b) uniform mix cancels

    prods = np.stack(
        [(R[:, a, s0:s0 + sl] * R[:, b, s0:s0 + sl]).sum(-1)
         for s0 in starts for a in range(4) for b in range(a + 1, 4)], 1,
    )
    per_pair(prods, 0.95, lambda a, t: a >= t)  # (c) coincidence decodes


def test_echo_corpus_class_coding(tmp_path):
    """The echo ablation corpus's information structure (synthetic.py
    ``class_conditioned="echo"``): the pair-member bit is coded in the SIGN
    of the anchor→echo phase offset (±π/2) at a 64-sample lag, XOR'd with a
    fresh random bit per slot across regions.  Asserts:

    (a) position-blind pooled conv-bank features — quadrature filters AT the
        carrier frequencies, gelu/square nonlinearities, mean+max pooling,
        INCLUDING all cross-region products (the honest XOR falsifier) —
        leave the member at chance, while the pair stays easy;
    (b) a single region's ordered lag-product signs are at chance (the
        per-slot XOR bit makes any one region coin-flip noise);
    (c) the ordered cross-region lag-product readout (position-aware
        in-region comparison + between-region integration — the modules the
        paper ablates) decodes the member near-perfectly.
    """
    import pickle

    from imagined_speech_translation_tpu.data.regions import ELECTRODE_REGIONS
    from imagined_speech_translation_tpu.data.synthetic import (
        DEFAULT_TEXTS,
        ECHO_ALT_FREQS,
        ECHO_ANCHOR_LEN,
        ECHO_CODEBOOK,
        ECHO_ECHO_LENS,
        ECHO_FREQS,
        echo_layout,
        make_synthetic_corpus,
        make_synthetic_montage,
    )

    T = 384
    labels = make_synthetic_montage(tmp_path / "m.csv")
    paths = make_synthetic_corpus(
        tmp_path / "data", n_files=4, samples_per_file=96, n_timepoints=T,
        class_conditioned="echo", montage_labels=labels, seed=3,
    )
    samples = [s for p in paths for s in pickle.load(open(p, "rb"))]
    X = np.stack([s["input_features"][0] for s in samples])
    y = np.array([DEFAULT_TEXTS.index(s["text"]) for s in samples])
    region_of = np.full(X.shape[1], -1)
    for r, (_, mem) in enumerate(ELECTRODE_REGIONS.items()):
        m = set(mem)
        for c, lab in enumerate(labels):
            if lab in m:
                region_of[c] = r
    R = np.stack([X[:, region_of == r].mean(1) for r in range(4)], 1)  # (N,4,T)
    pair, member = y // 2, y % 2
    slots = echo_layout(T)

    def centroid_acc(feats, yy):
        n = len(yy)
        idx = np.random.default_rng(0).permutation(n)
        tr, te = idx[: n // 2], idx[n // 2:]
        mu, sd = feats[tr].mean(0), feats[tr].std(0) + 1e-9
        f = (feats - mu) / sd
        cents = np.stack(
            [f[tr][yy[tr] == k].mean(0) for k in range(yy.max() + 1)]
        )
        pred = np.argmin(((f[te][:, None] - cents[None]) ** 2).sum(-1), 1)
        return (pred == yy[te]).mean()

    def per_pair(feats, thresh, op):
        for p_ in range(4):
            m = pair == p_
            a = centroid_acc(feats[m], member[m])
            assert op(a, thresh), f"pair {p_}: acc {a} vs {thresh}"

    # ---- (a) position-blind pooled conv bank + cross-region products ----
    tt = np.arange(25) / 256.0
    filts = []
    bank_freqs = sorted(
        set(ECHO_FREQS) | {f for f in ECHO_ALT_FREQS if f is not None}
    )
    for f_hz in bank_freqs:
        w = np.hanning(25)
        filts.append(w * np.cos(2 * np.pi * f_hz * tt))
        filts.append(w * np.sin(2 * np.pi * f_hz * tt))
    pooled = []
    for filt in filts:
        u = np.stack(
            [np.convolve(R[i, r], filt, "valid") for i in range(len(y))
             for r in range(4)], 0,
        ).reshape(len(y), 4, -1)
        for g in (np.maximum(u, 0), np.maximum(-u, 0), u * u):
            pooled.append(g.mean(-1))
            pooled.append(g.max(-1))
    P = np.stack(pooled, -1)  # (N, 4, F)
    flat = P.reshape(len(y), -1)
    cross = np.einsum("nrf,nsf->nrsf", P, P)[
        :, np.triu_indices(4, 1)[0], np.triu_indices(4, 1)[1], :
    ].reshape(len(y), -1)
    blind = np.concatenate([flat, cross], 1)
    per_pair(blind, 0.72, lambda a, t: a <= t)  # member ~ chance
    # per-channel spectral magnitudes: the pair signature (36-60 Hz
    # per-channel mix) is region-locally easy.  NOTE: full-window |FFT|
    # is NOT member-blind — the anchor/echo coherent pair leaves
    # interference fringes |1 + e^{i(δ−2πfL)}| whose sign-dependence a
    # GLOBAL-receptive-field quadratic can read.  That adversary is
    # outside the ablated model class (the conv stem's RF is 25 < lag
    # 64 and no ablated variant has a pre-pooling global-RF path), so
    # the sealed claim — and assertion (a) above — is for pooled LOCAL
    # features.
    spec = np.abs(np.fft.rfft(X[:, region_of >= 0], axis=-1)).reshape(
        len(y), -1
    )
    assert centroid_acc(spec, pair) > 0.9

    # ---- position-aware ordered readout -----------------------------------
    # per slot/region a SIGNED statistic whose sign is b(r, j):
    # * carrier-pair slots (alt freq set): alt-band energy at the anchor
    #   window minus at the echo window ("which carrier came first");
    # * phase slot: Im(conj(z_anchor) z_echo) of the quadrature demod.
    wa = np.hanning(ECHO_ANCHOR_LEN)
    ta = np.arange(ECHO_ANCHOR_LEN) / 256.0
    stat = np.zeros((len(y), 3, 4))
    for j, (a0, e0) in enumerate(slots):
        e_len = ECHO_ECHO_LENS[j]
        we = np.hanning(e_len)
        te = np.arange(e_len) / 256.0
        if ECHO_ALT_FREQS[j] is not None:
            fa = wa * np.exp(-2j * np.pi * ECHO_ALT_FREQS[j] * ta)
            fe = we * np.exp(-2j * np.pi * ECHO_ALT_FREQS[j] * te)
            ea = np.abs((R[:, :, a0:a0 + ECHO_ANCHOR_LEN] * fa).sum(-1))
            ee = np.abs((R[:, :, e0:e0 + e_len] * fe).sum(-1))
            stat[:, j] = ea - ee  # >0: alt carrier anchored first (b=1)
        else:
            fa = wa * np.exp(-2j * np.pi * ECHO_FREQS[j] * ta)
            fe = we * np.exp(-2j * np.pi * ECHO_FREQS[j] * te)
            za = (R[:, :, a0:a0 + ECHO_ANCHOR_LEN] * fa).sum(-1)
            ze = (R[:, :, e0:e0 + e_len] * fe).sum(-1)
            stat[:, j] = -np.imag(np.conj(za) * ze)

    # (b) the XOR-masked slot: any single region alone is coin-flip noise
    per_pair(stat[:, 1:2, 0], 0.72, lambda a, t: a <= t)

    # (c) cross-region split scoring over the signed statistics
    SPLITS = (((0, 1), (2, 3)), ((0, 2), (1, 3)), ((0, 3), (1, 2)))
    sgn, w = np.sign(stat), np.abs(stat)
    correct = 0
    for i in range(len(y)):
        class_scores = np.zeros(len(ECHO_CODEBOOK))
        slot_scores = np.zeros((3, 3))
        for j in range(3):
            for c, (ga, gb) in enumerate(SPLITS):
                pred = -np.ones(4)
                pred[list(gb)] = 1.0  # group B carries b=1
                agree = (sgn[i, j] * pred * w[i, j]).sum()
                # XOR-masked slot: sign convention unknown per sample
                slot_scores[j, c] = abs(agree) if j == 1 else agree
        for k, code in enumerate(ECHO_CODEBOOK):
            class_scores[k] = sum(slot_scores[j, code[j]] for j in range(3))
        correct += int(np.argmax(class_scores) == y[i])
    assert correct / len(y) >= 0.95, f"ordered readout acc {correct / len(y)}"
