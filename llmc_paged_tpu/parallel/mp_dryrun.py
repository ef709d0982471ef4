"""Multi-PROCESS dryrun: the DCN / multi-host execution path.

The reference's only real multi-process execution is DDP under torchrun
(train_gpt2.py:400-428,577-578): N OS processes, a coordinator, and
collectives that cross process boundaries. The JAX analogue is
multi-controller SPMD — every process runs this same program, calls
`jax.distributed.initialize` (sharding.init_distributed), sees the
GLOBAL device set, and executes the same jitted computation over a mesh
that spans processes; XLA's cross-process collectives carry the
psums that single-process meshes run in shared memory.

This module proves that path end-to-end on CPU: a parent spawns
NPROCS processes x (devices/NPROCS) virtual CPU devices each, every
process builds the global mesh and runs

  1. the FULL int8 continuous-batching engine under tensor parallelism
     (admission, batched prefill, chunked decode chains, pool pressure),
     asserting token equality with a single-device in-process run, and
  2. one DP AdamW training step over the ("data", "model") mesh
     (the torchrun-DDP equivalent), asserting a finite, identical loss.

Run directly:  python -m llmc_paged_tpu.parallel.mp_dryrun [--nprocs 2]
               [--devices 8]
Used by:       __graft_entry__.dryrun_multichip (2-process leg).

Multi-controller rules this relies on (and demonstrates):
- host (numpy / uncommitted jnp) inputs to a jitted fn over a global
  mesh are valid when identical on all processes — the engine's token
  ids, positions, and block tables are host state driven by the
  deterministic scheduler, so they are;
- outputs replicated over the mesh are fully-addressable on every
  process, so the engine's host-side `np.asarray(...)` pulls work
  unchanged;
- cross-process CPU collectives use the gloo backend
  (jax_cpu_collectives_implementation).
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _child(coord: str, nprocs: int, proc_id: int, local_devices: int) -> None:
    import jax

    # must precede backend init; the axon TPU plugin ignores env vars
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", local_devices)
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=nprocs, process_id=proc_id)
    n_global = nprocs * local_devices
    assert len(jax.devices()) == n_global, \
        (len(jax.devices()), n_global)
    assert len(jax.local_devices()) == local_devices
    assert jax.process_count() == nprocs
    # past this line failures are CORRECTNESS failures, not environment
    # ones — the parent uses this sentinel to tell them apart
    print(f"MP_INIT_OK p{proc_id}", flush=True)

    import numpy as np
    import jax.numpy as jnp
    import optax

    from llmc_paged_tpu.config import EngineConfig, GPT2Config, PageConfig
    from llmc_paged_tpu.engine.engine import InferenceEngine
    from llmc_paged_tpu.engine.scheduler import Request
    from llmc_paged_tpu.models import gpt2
    from llmc_paged_tpu.parallel import sharding as sh

    def log(msg: str) -> None:
        print(f"[mp_dryrun p{proc_id}] {msg}", flush=True)

    # NH=8 so 'model' divides heads at any power-of-two device count here
    cfg = GPT2Config.tiny(max_seq_len=64, vocab_size=256, num_layers=2,
                          num_heads=8, channels=64)
    model = 1
    for cand in (8, 4, 2, 1):
        if n_global % cand == 0 and cfg.num_heads % cand == 0:
            model = cand
            break
    data = n_global // model
    log(f"global devices={n_global} mesh: model={model} data={data}")
    params_np = jax.tree.map(np.asarray,
                             gpt2.init_params(cfg, jax.random.PRNGKey(0)))

    # --- 1) int8 TP engine, identical host schedule on every process ---
    rng = np.random.default_rng(7)
    reqs = [(list(rng.integers(0, cfg.vocab_size, int(n))), int(new))
            for n, new in zip((5, 11, 7, 9), (10, 8, 12, 9))]
    page_cfg = PageConfig(page_size=8, num_pages=10, max_seqs=8,
                          pages_per_seq=6, kv_dtype="int8")

    def run_engine(mesh_shape):
        econf = EngineConfig(cache_mode="paged", page=page_cfg,
                             greedy=True, max_batch=4, decode_chunk=6,
                             param_dtype="int8", mesh_shape=mesh_shape)
        eng = InferenceEngine(params_np, cfg, econf)
        done = eng.run([Request(rid=i, prompt=p, max_new_tokens=new)
                        for i, (p, new) in enumerate(reqs)])
        assert len(done) == len(reqs)
        return {r.rid: r.tokens for r in done}

    t0 = time.monotonic()
    tp_out = run_engine({"model": model})
    log(f"TP int8 engine over {nprocs} processes OK "
        f"({time.monotonic() - t0:.1f}s)")
    ref_out = run_engine(None)   # single (local) device, no mesh
    assert tp_out == ref_out, "multi-process TP tokens != single-device"
    log(f"tokens match single-device "
        f"(all {sum(len(v) for v in tp_out.values())})")

    # --- 2) DP train step across processes (torchrun-DDP analogue) ---
    mesh = sh.make_mesh(model=model, data=data)
    tx = optax.adamw(1e-4, b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.0)
    train_step, shard_batch, replicate = sh.make_dp_train_step(cfg, mesh, tx)
    params = replicate(gpt2.to_device(params_np, cfg))
    opt_state = replicate(tx.init(params))
    brng = np.random.default_rng(1)
    B = max(4, data)
    x = brng.integers(0, cfg.vocab_size, (B, 16)).astype(np.int32)
    y = brng.integers(0, cfg.vocab_size, (B, 16)).astype(np.int32)
    xd, yd = shard_batch(jnp.asarray(x), jnp.asarray(y))
    params, opt_state, loss = train_step(params, opt_state, xd, yd, cfg)
    loss.block_until_ready()
    assert bool(jnp.isfinite(loss))
    log(f"DP train step OK loss={float(loss):.4f}")
    print(f"MP_DRYRUN_OK p{proc_id}", flush=True)


class MpChildFailure(RuntimeError):
    """A child got PAST distributed init (environment was fine) and then
    failed — a genuine multi-process correctness failure. Callers that
    treat environmental problems (no gloo, port in use, spawn failure)
    as skippable must NOT swallow this."""


def run_parent(nprocs: int = 2, n_devices: int = 8, port: int = 12657,
               timeout_s: float = 900.0) -> None:
    """Spawn nprocs copies of this module in child mode and require every
    one to print its MP_DRYRUN_OK sentinel. Raises MpChildFailure when a
    child failed after its MP_INIT_OK sentinel (correctness), plain
    RuntimeError when it never initialized (environmental)."""
    assert n_devices % nprocs == 0, (n_devices, nprocs)
    local = n_devices // nprocs
    env = dict(os.environ)
    # children configure devices via jax.config; a forced virtual-device
    # count inherited from the parent's XLA_FLAGS would double-apply
    env.pop("JAX_PLATFORMS", None)
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
    env["XLA_FLAGS"] = " ".join(flags)
    procs = []
    for pid in range(nprocs):
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "llmc_paged_tpu.parallel.mp_dryrun",
             "--role", "child", "--coord", f"localhost:{port}",
             "--nprocs", str(nprocs), "--proc-id", str(pid),
             "--local-devices", str(local)],
            cwd=REPO, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True))
    deadline = time.monotonic() + timeout_s
    outs = []
    try:
        for pid, p in enumerate(procs):
            left = max(5.0, deadline - time.monotonic())
            out, _ = p.communicate(timeout=left)
            outs.append(out)
            failed = (p.returncode != 0
                      or f"MP_DRYRUN_OK p{pid}" not in out)
            if failed:
                exc = (MpChildFailure
                       if f"MP_INIT_OK p{pid}" in out else RuntimeError)
                raise exc(
                    f"mp_dryrun child {pid} rc={p.returncode}\n{out}")
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for out in outs:
        sys.stdout.write(out)
    print(f"[mp_dryrun] {nprocs}-process x {local}-device run OK",
          flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--role", choices=("parent", "child"), default="parent")
    ap.add_argument("--nprocs", type=int, default=2)
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--coord", default="localhost:12657")
    ap.add_argument("--proc-id", type=int, default=0)
    ap.add_argument("--local-devices", type=int, default=4)
    args = ap.parse_args()
    if args.role == "child":
        _child(args.coord, args.nprocs, args.proc_id, args.local_devices)
    else:
        run_parent(args.nprocs, args.devices,
                   port=int(args.coord.rsplit(":", 1)[1]))


if __name__ == "__main__":
    main()
