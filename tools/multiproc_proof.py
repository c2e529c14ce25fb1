"""Two-process ``jax.distributed`` cluster proof (CPU backend, localhost).

The multi-host story (``parallel/distributed.py``, the hybrid DCN branch in
``parallel/mesh.py:make_mesh``, the multihost orbax paths in
``training/checkpoint.py``) is exercised here with REAL
``jax.process_count() == 2`` execution — no virtual-mesh reshapes:

* two worker processes, each with 4 forced CPU devices, join a
  ``localhost`` coordinator via ``initialize_distributed`` (the same
  env-var contract production launchers use: ``IST_COORDINATOR`` /
  ``IST_NUM_PROCESSES`` / ``IST_PROCESS_ID``);
* ``make_mesh(n_dcn=2)`` takes the ``create_hybrid_device_mesh`` branch
  (process_count > 1), so the dcn axis maps across processes exactly as it
  maps across slices on a real pod;
* one full train step (grad-accum scan, composite loss, optimizer update)
  runs SPMD over the 8 global devices, batch sharded over ``('dcn',
  'data')`` — the gradient all-reduce crosses the process boundary;
* the updated state round-trips through the multihost orbax save/restore
  (``CheckpointManager`` with on-device global arrays);
* the step loss is compared against an identical single-process run
  (8 local devices, same seeds) — the collectives must not change the
  math.

Usage::

    python tools/multiproc_proof.py             # orchestrates everything
    python tools/multiproc_proof.py --worker N  # internal (spawned)

Writes ``runs/multiproc_proof/result.json``.

Reference scope note: the reference has no distributed machinery at all
(SURVEY.md §2.6); this proof covers net-new TPU-native scale-out.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import socket
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
N_PROCESSES = 2
DEVICES_PER_PROCESS = 4


# ---------------------------------------------------------------------------
# shared model/step construction (runs identically in every mode)
# ---------------------------------------------------------------------------


def _tiny_setup():
    """Config + numpy data + (local) train state, identical across
    processes/modes (pure function of fixed seeds)."""
    import jax
    import numpy as np

    from imagined_speech_translation_tpu.config import (
        AugmentationConfig,
        BartConfig,
        BrainEncoderConfig,
        Config,
        DataConfig,
        LossConfig,
        ModelConfig,
        OptimizerConfig,
        RegionEncoderConfig,
        TrainingConfig,
    )
    from imagined_speech_translation_tpu.training import (
        AdaptiveLossScheduler,
        TrainModule,
        build_optimizer,
        create_train_state,
    )

    h = 48
    micro = 8  # divisible by the dcn*data = 8 data-parallel devices
    cfg = Config(
        data=DataConfig(
            n_timepoints=64, max_length=8,
            augmentation=AugmentationConfig(enabled=False),
        ),
        model=ModelConfig(
            hidden_dim=h,
            max_region_channels=16,
            region_channel_counts=(16, 9, 11, 12),
            brain_encoder=BrainEncoderConfig(
                hidden_dim=h, fusion_heads=4, cross_region_heads=4,
                region_encoder=RegionEncoderConfig(
                    conv_channels=(8, 16, 24, 32, 48),
                    attn_heads=(4, 2, 2), se_reduction=4,
                ),
            ),
            bart=BartConfig(
                vocab_size=128, d_model=h, encoder_layers=3, decoder_layers=2,
                num_heads=4, ffn_dim=96, max_position_embeddings=32,
            ),
        ),
        training=TrainingConfig(
            batch_size=micro, grad_accum_steps=2,
            mixed_precision=False,  # CPU proof: bf16 targets the TPU MXU
            optimizer=OptimizerConfig(warmup_steps=2),
            loss=LossConfig(bow_vocab_size=16),
        ),
    ).validate()
    tc = cfg.training

    rng = np.random.default_rng(0)
    mask = np.zeros((4, 16), bool)
    for r, c in enumerate(cfg.model.region_channel_counts):
        mask[r, :c] = True
    sample = {
        "eeg": rng.normal(size=(micro, 4, 16, 64)).astype(np.float32),
        "decoder_input_ids": rng.integers(0, 128, (micro, 8)).astype(np.int32),
        "labels": rng.integers(0, 128, (micro, 8)).astype(np.int32),
        "attention_mask": np.ones((micro, 8), np.int32),
        "channel_mask": mask,
    }
    batch_np = {
        "eeg": rng.normal(
            size=(tc.grad_accum_steps, micro, 4, 16, 64)
        ).astype(np.float32),
        "decoder_input_ids": rng.integers(
            0, 128, (tc.grad_accum_steps, micro, 8)
        ).astype(np.int32),
        "labels": rng.integers(
            0, 128, (tc.grad_accum_steps, micro, 8)
        ).astype(np.int32),
        "attention_mask": np.ones((tc.grad_accum_steps, micro, 8), np.int32),
        "channel_mask": mask,
    }
    bow = np.arange(16, dtype=np.int32)
    module = TrainModule(cfg, bow_k=len(bow))
    params_shape = jax.eval_shape(
        lambda: module.init(
            jax.random.key(0),
            sample["eeg"],
            sample["decoder_input_ids"],
            sample["channel_mask"],
            method="init_all",
        )
    )["params"]
    optimizer = build_optimizer(params_shape, tc.optimizer, total_steps=10)
    weights = AdaptiveLossScheduler(tc.loss).initial_weights()
    state = create_train_state(module, jax.random.key(0), sample, optimizer, weights)
    return cfg, module, optimizer, bow, state, batch_np, mask


def _lift_tree_to_global(tree, mesh, spec_tree=None):
    """numpy pytree -> global jax.Arrays via make_array_from_callback (the
    multi-process-safe path: each process supplies only its addressable
    shards; ``device_put`` of host arrays cannot target non-addressable
    devices)."""
    import jax
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    def lift(x, sharding=None):
        x = np.asarray(x)
        sh = sharding or NamedSharding(mesh, P())
        return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])

    if spec_tree is None:
        return jax.tree.map(lift, tree)
    return jax.tree.map(lift, tree, spec_tree)


def _run_step(mesh, *, multiprocess: bool):
    """Build global state/batch on ``mesh``, run ONE train step, return
    (loss, new_state, module_bundle)."""
    import jax
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from imagined_speech_translation_tpu.parallel.mesh import (
        batch_sharding,
        state_sharding_tree,
    )
    from imagined_speech_translation_tpu.training import make_train_step
    from imagined_speech_translation_tpu.utils.cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()

    cfg, module, optimizer, bow, state, batch_np, mask = _tiny_setup()

    state_np = jax.device_get(state)
    shardings = state_sharding_tree(state_np, mesh, tp=False)
    state = _lift_tree_to_global(state_np, mesh, shardings)

    batch_specs = batch_sharding(mesh, batch_np, batch_axis=1)
    batch = {
        k: _lift_tree_to_global(v, mesh, batch_specs[k])
        if k != "channel_mask"
        else _lift_tree_to_global(v, mesh)
        for k, v in batch_np.items()
    }

    train_step = make_train_step(module, optimizer, cfg, bow)
    # the step rng is constant-folded inside jit: a locally-created key
    # array cannot be passed into a global SPMD program
    step = jax.jit(
        lambda s, b: train_step(s, b, jax.random.key(1, impl="threefry2x32"))
    )
    if multiprocess:
        # AOT compile, then line both processes up on a coordination-service
        # barrier BEFORE the first execution: on an oversubscribed single-core
        # host the two compiles finish minutes apart, and the early process
        # would otherwise sit in the Gloo communicator rendezvous past its
        # hard 30 s GetKeyValue deadline waiting for the late one.
        from imagined_speech_translation_tpu.parallel.distributed import (
            host_barrier,
        )

        step = step.lower(state, batch).compile()
        host_barrier("step_compiled", timeout_s=1800.0)
    new_state, metrics = step(state, batch)
    jax.block_until_ready(new_state.params)
    loss = float(np.asarray(jax.device_get(metrics["loss"])))
    return loss, new_state, (cfg, module, optimizer, bow)


def _local_tree_equal(a, b) -> bool:
    """Compare two global pytrees over their locally-addressable shards."""
    import jax
    import numpy as np

    ok = True
    for la, lb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        sa = {s.index: np.asarray(s.data) for s in la.addressable_shards}
        sb = {s.index: np.asarray(s.data) for s in lb.addressable_shards}
        if sa.keys() != sb.keys():
            return False
        for idx in sa:
            if not np.array_equal(sa[idx], sb[idx], equal_nan=True):
                ok = False
    return ok


# ---------------------------------------------------------------------------
# modes
# ---------------------------------------------------------------------------


def _pin_cpu(n_devices: int):
    os.environ["JAX_PLATFORMS"] = "cpu"
    # force EXACTLY n_devices: an inherited device-count flag (e.g. the test
    # suite's 8-device conftest env leaking into our subprocesses) must be
    # replaced, not kept — worker device counts are part of the proof
    flags = re.sub(
        r"--xla_force_host_platform_device_count=\d+",
        "",
        os.environ.get("XLA_FLAGS", ""),
    ).strip()
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={n_devices}"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    return jax


def run_worker(out_dir: Path) -> None:
    """One of the two cluster processes (env-var configured)."""
    jax = _pin_cpu(DEVICES_PER_PROCESS)

    from imagined_speech_translation_tpu.parallel import make_mesh
    from imagined_speech_translation_tpu.parallel.distributed import (
        host_barrier,
        initialize_distributed,
        is_primary,
    )
    from imagined_speech_translation_tpu.training.checkpoint import (
        CheckpointManager,
    )

    assert initialize_distributed(), "coordinator env not picked up"
    assert jax.process_count() == N_PROCESSES, jax.process_count()
    assert jax.device_count() == N_PROCESSES * DEVICES_PER_PROCESS

    # hybrid DCN mesh through the REAL create_hybrid_device_mesh branch:
    # dcn axis spans the two processes
    mesh = make_mesh(n_dcn=N_PROCESSES)
    mesh_procs = {
        ax: sorted(
            {d.process_index for d in mesh.devices.take([0], axis=i).flat}
        )
        for i, ax in enumerate(mesh.axis_names)
    }

    loss, new_state, _ = _run_step(mesh, multiprocess=True)

    # multihost orbax roundtrip: save the sharded state from both
    # processes, restore into a zeroed clone, compare local shards
    import jax.numpy as jnp

    ckpt = CheckpointManager(out_dir / "ckpt")
    ckpt.save_best(new_state, {"epoch": 0, "loss": loss})
    zeroed = jax.tree.map(jnp.zeros_like, new_state)
    restored, meta = ckpt.restore("best_model", zeroed)
    roundtrip_ok = _local_tree_equal(new_state.params, restored.params)
    assert meta["epoch"] == 0

    host_barrier("proof_done", timeout_s=1800.0)
    if is_primary():
        (out_dir / "worker_result.json").write_text(json.dumps({
            "loss": loss,
            "process_count": jax.process_count(),
            "global_devices": jax.device_count(),
            "mesh_shape": dict(mesh.shape),
            "mesh_axis_process_spread": {
                k: v for k, v in mesh_procs.items()
            },
            "hybrid_branch": True,
            "checkpoint_roundtrip_ok": bool(roundtrip_ok),
            "step": int(jax.device_get(new_state.step)),
        }))
    host_barrier("proof_written", timeout_s=1800.0)


def run_single(out_dir: Path) -> None:
    """Single-process reference: same math on 8 local devices."""
    _pin_cpu(N_PROCESSES * DEVICES_PER_PROCESS)

    from imagined_speech_translation_tpu.parallel import make_mesh

    mesh = make_mesh(n_dcn=N_PROCESSES)  # reshape fallback (1 process)
    loss, _, _ = _run_step(mesh, multiprocess=False)
    (out_dir / "single_result.json").write_text(json.dumps({"loss": loss}))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def orchestrate(out_dir: Path, *, timeout: float = 2100.0) -> dict:
    out_dir.mkdir(parents=True, exist_ok=True)
    base_env = {
        k: v for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS", "IST_COORDINATOR",
                     "IST_NUM_PROCESSES", "IST_PROCESS_ID", "IST_DISTRIBUTED")
    }
    base_env["JAX_PLATFORMS"] = "cpu"

    t0 = time.time()
    single = subprocess.run(
        [sys.executable, __file__, "--single", "--out", str(out_dir)],
        env=base_env, cwd=REPO, capture_output=True, text=True,
        timeout=timeout,
    )
    if single.returncode != 0:
        raise RuntimeError(f"single-process reference failed:\n{single.stderr[-3000:]}")

    port = _free_port()
    workers = []
    for i in range(N_PROCESSES):
        env = dict(
            base_env,
            IST_COORDINATOR=f"localhost:{port}",
            IST_NUM_PROCESSES=str(N_PROCESSES),
            IST_PROCESS_ID=str(i),
        )
        workers.append(subprocess.Popen(
            [sys.executable, __file__, "--worker", str(i), "--out", str(out_dir)],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        ))
    outs = [w.communicate(timeout=timeout) for w in workers]
    for i, (w, (so, se)) in enumerate(zip(workers, outs)):
        if w.returncode != 0:
            raise RuntimeError(
                f"worker {i} failed (rc={w.returncode}):\n{se[-3000:]}"
            )

    single_loss = json.loads((out_dir / "single_result.json").read_text())["loss"]
    wres = json.loads((out_dir / "worker_result.json").read_text())
    delta = abs(wres["loss"] - single_loss)
    result = {
        "ok": (
            wres["process_count"] == N_PROCESSES
            and wres["checkpoint_roundtrip_ok"]
            and delta <= 1e-5 * max(1.0, abs(single_loss))
        ),
        "loss_multiprocess": wres["loss"],
        "loss_singleprocess": single_loss,
        "loss_delta": delta,
        "elapsed_s": round(time.time() - t0, 1),
        **{k: v for k, v in wres.items() if k != "loss"},
    }
    (out_dir / "result.json").write_text(json.dumps(result, indent=2))
    return result


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n", 1)[0])
    ap.add_argument("--worker", type=int, default=None)
    ap.add_argument("--single", action="store_true")
    ap.add_argument("--out", default=str(REPO / "runs" / "multiproc_proof"))
    args = ap.parse_args(argv)
    out = Path(args.out)
    if args.single:
        run_single(out)
        return 0
    if args.worker is not None:
        run_worker(out)
        return 0
    result = orchestrate(out)
    print(json.dumps(result))
    return 0 if result["ok"] else 1


if __name__ == "__main__":
    sys.path.insert(0, str(REPO))
    raise SystemExit(main())
