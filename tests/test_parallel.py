"""Multi-device sharding tests on the virtual 8-device CPU mesh: DP batch
sharding, TP param sharding of the BART stack, numeric equivalence with the
single-device step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imagined_speech_translation_tpu.parallel import (
    batch_sharding,
    make_mesh,
    shard_train_state,
    state_sharding_tree,
)
from imagined_speech_translation_tpu.parallel.mesh import shard_batch
from imagined_speech_translation_tpu.training import (
    AdaptiveLossScheduler,
    TrainModule,
    build_optimizer,
    create_train_state,
    get_top_k_vocab_indices,
    make_train_step,
)

from tests.helpers import build_dataset, tiny_config, tiny_tokenizer


@pytest.fixture(scope="module")
def setup(tmp_path_factory, eight_devices):
    tok = tiny_tokenizer()
    cfg = tiny_config(tok.vocab_size)
    # batch big enough to shard over 4 data shards: micro batch 4
    import dataclasses

    cfg = cfg.replace(
        training=dataclasses.replace(cfg.training, batch_size=4, grad_accum_steps=2)
    )
    ds = build_dataset(tmp_path_factory.mktemp("par_ds"), tok, cfg, n_files=2,
                       samples_per_file=6)
    bow = get_top_k_vocab_indices(tok, cfg.training.loss.bow_vocab_size)
    module = TrainModule(cfg, bow_k=len(bow))
    sample = ds.get_batch(np.arange(cfg.training.batch_size))
    optimizer = build_optimizer(
        jax.eval_shape(
            lambda: module.init(
                jax.random.key(0),
                jnp.asarray(sample["eeg"]),
                jnp.asarray(sample["decoder_input_ids"]),
                jnp.asarray(sample["channel_mask"]),
                method="init_all",
            )
        )["params"],
        cfg.training.optimizer,
        total_steps=10,
    )
    weights = AdaptiveLossScheduler(cfg.training.loss).initial_weights()
    state = create_train_state(module, jax.random.key(0), sample, optimizer, weights)
    tc = cfg.training
    n = tc.batch_size * tc.grad_accum_steps
    raw = ds.get_batch(np.arange(n))
    batch = {}
    for k, v in raw.items():
        if k == "channel_mask":
            batch[k] = jnp.asarray(v)
        else:
            batch[k] = jnp.asarray(
                v.reshape((tc.grad_accum_steps, tc.batch_size) + v.shape[1:])
            )
    return cfg, module, optimizer, bow, state, batch


def test_make_mesh_shapes(eight_devices):
    mesh = make_mesh(4, 2)
    assert mesh.shape == {"data": 4, "model": 2}
    mesh2 = make_mesh(-1, 2)
    assert mesh2.shape == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        make_mesh(-1, 3)


def test_tp_sharding_rules(setup, eight_devices):
    cfg, module, optimizer, bow, state, batch = setup
    mesh = make_mesh(4, 2)
    shardings = state_sharding_tree(state, mesh, tp=True)
    fc1 = shardings.params["model"]["bart"]["layer0"]["fc1"]["kernel"]
    assert fc1.spec == jax.sharding.PartitionSpec(None, "model")
    fc2 = shardings.params["model"]["bart"]["layer0"]["fc2"]["kernel"]
    assert fc2.spec == jax.sharding.PartitionSpec("model", None)
    # optimizer moments mirror the rules
    flat = jax.tree_util.tree_flatten_with_path(shardings.opt_state)[0]
    specs = {
        "/".join(str(k) for k in path): s for path, s in flat
        if hasattr(s, "spec")
    }
    assert any(
        "fc1" in p and s.spec == jax.sharding.PartitionSpec(None, "model")
        for p, s in specs.items()
    )


def test_dp_tp_step_matches_single_device(setup, eight_devices):
    cfg, module, optimizer, bow, state, batch = setup
    step = make_train_step(module, optimizer, cfg, bow)
    rng = jax.random.key(7)

    # single device baseline
    s1, m1 = jax.jit(step)(state, batch, rng)

    # 4x2 mesh: data-sharded batch (micro axis), TP-sharded params
    mesh = make_mesh(4, 2)
    sharded_state = shard_train_state(state, mesh, tp=True)
    sharded_batch = shard_batch(mesh, batch, batch_axis=1)
    sharded_batch["channel_mask"] = batch["channel_mask"]
    s2, m2 = jax.jit(step)(sharded_state, sharded_batch, rng)

    assert np.isfinite(float(m2["loss"]))
    np.testing.assert_allclose(
        float(m1["loss"]), float(m2["loss"]), rtol=2e-4, atol=2e-4
    )
    # params after one step agree
    a = np.asarray(jax.device_get(jax.tree_util.tree_leaves(s1.params)[0]))
    b = np.asarray(jax.device_get(jax.tree_util.tree_leaves(s2.params)[0]))
    np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-4)


def test_data_parallel_generate_matches_single_device(setup, eight_devices):
    """Beam decode under a DP mesh returns the same tokens as single-device."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from imagined_speech_translation_tpu.decode import (
        DecodeParams,
        build_generate_fn,
    )
    from imagined_speech_translation_tpu.models import EEGDecodingModel
    from tests.helpers import tiny_tokenizer

    cfg, module, optimizer, bow, state, batch = setup
    tok = tiny_tokenizer()
    model = EEGDecodingModel(cfg.model)
    dp = DecodeParams(
        max_length=8, min_length=2, num_beams=3,
        pad_token_id=tok.pad_token_id, eos_token_id=tok.sep_token_id,
        decoder_start_token_id=tok.bos_token_id,
    )
    gen = build_generate_fn(model, dp)
    eeg = batch["eeg"].reshape((-1,) + batch["eeg"].shape[2:])  # (8, 4, 16, T)
    mask = batch["channel_mask"]
    mv = state.model_variables()

    ref = np.asarray(gen(mv, eeg, mask))

    mesh = make_mesh(8, 1)
    eeg_sharded = jax.device_put(eeg, NamedSharding(mesh, P("data")))
    mv_repl = jax.device_put(mv, NamedSharding(mesh, P()))
    got = np.asarray(gen(mv_repl, eeg_sharded, mask))
    np.testing.assert_array_equal(ref, got)


def test_dcn_mesh_shapes(eight_devices):
    mesh = make_mesh(2, 2, n_dcn=2)
    assert mesh.shape == {"dcn": 2, "data": 2, "model": 2}
    mesh2 = make_mesh(-1, 2, n_dcn=2)
    assert mesh2.shape == {"dcn": 2, "data": 2, "model": 2}
    with pytest.raises(ValueError):
        make_mesh(8, 1, n_dcn=2)


def test_dcn_batch_sharding(setup, eight_devices):
    cfg, module, optimizer, bow, state, batch = setup
    mesh = make_mesh(2, 2, n_dcn=2)
    sh = batch_sharding(mesh, batch, batch_axis=1)
    assert tuple(sh["eeg"].spec)[1] == ("dcn", "data")


def test_dcn_step_matches_single_device(setup, eight_devices):
    """Full train step on a 2(dcn)x2(data)x2(model) hybrid mesh ≡ single
    device — the multi-slice sharding compiles and reduces correctly."""
    cfg, module, optimizer, bow, state, batch = setup
    step = make_train_step(module, optimizer, cfg, bow)
    rng = jax.random.key(7)
    s1, m1 = jax.jit(step)(state, batch, rng)

    mesh = make_mesh(2, 2, n_dcn=2)
    sharded_state = shard_train_state(state, mesh, tp=True)
    sharded_batch = shard_batch(mesh, batch, batch_axis=1)
    sharded_batch["channel_mask"] = batch["channel_mask"]
    s2, m2 = jax.jit(step)(sharded_state, sharded_batch, rng)
    np.testing.assert_allclose(
        float(m1["loss"]), float(m2["loss"]), rtol=2e-4, atol=2e-4
    )


def test_distributed_helpers_single_process():
    from imagined_speech_translation_tpu.parallel import (
        initialize_distributed,
        is_primary,
        sync_hosts,
    )

    # no coordinator configured -> no-op, single-process semantics
    assert initialize_distributed() is False
    assert is_primary() is True
    sync_hosts()  # no-op


def test_batch_sharding_specs(setup, eight_devices):
    cfg, module, optimizer, bow, state, batch = setup
    mesh = make_mesh(4, 2)
    sh = batch_sharding(mesh, batch, batch_axis=1)
    spec = tuple(sh["eeg"].spec)
    assert spec[1] == "data" and all(s is None for s in spec[2:])
    assert tuple(sh["channel_mask"].spec) == ()


def test_trainer_runs_on_mesh(tmp_path, eight_devices):
    """The PRODUCT trainer (not just make_train_step) shards state and
    batches when cfg.parallel requests a mesh: one epoch + eval end-to-end
    on the virtual 2(data)x2(model) mesh."""
    import dataclasses

    from imagined_speech_translation_tpu.config import ParallelConfig
    from imagined_speech_translation_tpu.training import (
        EEGTrainer,
        get_top_k_vocab_indices,
    )
    from tests.helpers import build_dataset, tiny_config, tiny_tokenizer

    tok = tiny_tokenizer()
    cfg = tiny_config(tok.vocab_size)
    cfg = dataclasses.replace(
        cfg, parallel=ParallelConfig(data_axis=2, model_axis=2)
    )
    dataset = build_dataset(tmp_path, tok, cfg, n_files=2, samples_per_file=6)
    idx = np.arange(len(dataset))
    bow = get_top_k_vocab_indices(tok, cfg.training.loss.bow_vocab_size)
    trainer = EEGTrainer(
        cfg, dataset, tok, bow_indices=bow,
        train_indices=idx[:8], val_indices=idx[8:],
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    state = trainer.init_state(jax.random.key(0))
    assert trainer.mesh is not None
    assert trainer.mesh.shape == {"data": 2, "model": 2}
    # params committed onto the mesh with NamedShardings
    leaf = jax.tree.leaves(state.params)[0]
    assert isinstance(leaf.sharding, jax.sharding.NamedSharding)
    state, loss = trainer.train_epoch(state, 0)
    assert np.isfinite(loss)
    metrics = trainer.evaluate(state)
    assert np.isfinite(metrics["val_loss"])


def test_trainer_mesh_batch_divisibility_error(tmp_path, eight_devices):
    import dataclasses

    from imagined_speech_translation_tpu.config import ParallelConfig
    from imagined_speech_translation_tpu.training import (
        EEGTrainer,
        get_top_k_vocab_indices,
    )
    from tests.helpers import build_dataset, tiny_config, tiny_tokenizer

    tok = tiny_tokenizer()
    cfg = tiny_config(tok.vocab_size)  # micro batch 2
    cfg = dataclasses.replace(
        cfg, parallel=ParallelConfig(data_axis=8, model_axis=1)
    )
    dataset = build_dataset(tmp_path, tok, cfg, n_files=2, samples_per_file=6)
    idx = np.arange(len(dataset))
    bow = get_top_k_vocab_indices(tok, cfg.training.loss.bow_vocab_size)
    trainer = EEGTrainer(
        cfg, dataset, tok, bow_indices=bow,
        train_indices=idx[:8], val_indices=idx[8:],
    )
    with pytest.raises(ValueError, match="not divisible"):
        trainer.init_state(jax.random.key(0))


def test_sharded_serving_decode_matches_single_device(
    setup, eight_devices, tmp_path
):
    """``build_decode_fn(mesh=)`` — the serving twin of the trainer's DP
    axis — produces text identical to the unsharded program, enforces the
    batch-divisibility contract, and composes with the cross-session
    ``BatchScheduler`` (pooled windows fan out over all 8 devices)."""
    import asyncio

    from imagined_speech_translation_tpu.cli.serve import build_decode_fn
    from imagined_speech_translation_tpu.data.regions import RegionSpec
    from imagined_speech_translation_tpu.data.synthetic import (
        make_synthetic_montage,
    )
    from imagined_speech_translation_tpu.runtime import BatchScheduler

    cfg, module, optimizer, bow, state, batch = setup
    tok = tiny_tokenizer()
    labels = make_synthetic_montage(tmp_path / "m.csv")
    spec = RegionSpec.from_channel_names(labels)
    mv = state.model_variables()

    ref_fn = build_decode_fn(cfg, tok, spec, mv)
    dp_fn = build_decode_fn(cfg, tok, spec, mv, mesh=make_mesh(8, 1))

    n_ch = int(spec.gather_indices.max() + 1)
    windows = (
        np.random.default_rng(7)
        .normal(size=(8, n_ch, cfg.data.n_timepoints))
        .astype(np.float32)
    )
    ref_texts = ref_fn(windows)
    assert dp_fn(windows) == ref_texts
    with pytest.raises(ValueError, match="not divisible"):
        dp_fn(windows[:3])

    # pooled scheduler feeding the sharded program: 5 live windows pad to
    # the static batch of 8, outputs match the unsharded per-row decodes
    async def flow():
        async with BatchScheduler(dp_fn, max_batch=8, max_delay_ms=20) as s:
            return await asyncio.gather(*(s.submit(w) for w in windows[:5]))

    assert asyncio.run(flow()) == ref_texts[:5]
