"""Kernel-lab harness — the dev/cuda/common.h pattern for Pallas:
every bench file pairs a reference implementation with N kernel versions,
validates each against the reference, then sweeps configurations
(dev/cuda/common.h:72-110 validate_result + benchmark_kernel)."""

from __future__ import annotations

import time
from typing import Callable, Dict, Iterable, Tuple

import numpy as np

import jax
import jax.numpy as jnp


def validate_result(fn: Callable, ref: Callable, args: tuple,
                    rtol: float = 1e-4, atol: float = 1e-4,
                    name: str = "kernel") -> None:
    out = np.asarray(fn(*args))
    expect = np.asarray(ref(*args))
    err = np.max(np.abs(out - expect))
    ok = np.allclose(out, expect, rtol=rtol, atol=atol)
    status = "OK" if ok else "NOT OK"
    print(f"[validate] {name}: max|Δ|={err:.3e} {status}")
    if not ok:
        raise AssertionError(f"{name} mismatch: {err}")


def _chained_fn(fn: Callable) -> Callable:
    """Wrap fn as jit(g(scalar, *args) -> (out, scalar')) where scalar' is
    a cheap reduction of out and scalar feeds (scaled by 1e-30 so XLA cannot algebraically
    eliminate it) into the first
    float argument — one dispatch per call, each call data-dependent on
    the previous. Without this the environment OVERLAPS independent queued
    programs (and memoizes repeated identical ones), yielding impossible
    multi-TB/s readings."""
    @jax.jit
    def g(scalar, *args):
        # thread the chaining scalar into the first INEXACT array leaf of
        # the args pytree (not blindly args[0], which may be an int token
        # array or a params dict)
        leaves, treedef = jax.tree.flatten(args)
        for i, leaf in enumerate(leaves):
            if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype,
                                                         jnp.inexact):
                leaves[i] = leaf + (scalar * jnp.float32(1e-30)
                                    ).astype(leaf.dtype)
                break
        else:
            raise TypeError("benchmark() needs at least one float array "
                            "leaf in args to chain calls through")
        out = fn(*jax.tree.unflatten(treedef, leaves))
        first = jax.tree.leaves(out)[0]
        return out, jnp.sum(first).astype(jnp.float32)

    return g


def benchmark(fn: Callable, args: tuple, iters: int = 50,
              warmup: int = 3) -> float:
    """Median-of-3 wall time per call (ms): dispatches stay pipelined but
    every call is data-dependent on the previous one (see _chained_fn).

    Sync is a SCALAR VALUE FETCH, not block_until_ready: measured r5, the
    relay's block_until_ready returns with programs still in flight
    (8 chained 8192^2 matmuls "completed" in 0.4ms), so any timing that
    ends on it reads dispatch cost only. The fetch costs one host
    round trip (~30-60ms through the tunnel); we cancel it (and any other
    per-pass constant) by timing two different chain lengths and taking
    the slope: per-call = (t(iters) - t(iters/5)) / (iters - iters/5)."""
    g = _chained_fn(fn)
    s = jnp.float32(0)
    for _ in range(warmup + 1):
        r, s = g(s, *args)
    float(s)                      # real sync (block_until_ready is a no-op)

    def run_chain(n: int) -> float:
        nonlocal s
        t0 = time.perf_counter()
        for _ in range(n):
            r, s = g(s, *args)
        float(s)
        return time.perf_counter() - t0

    lo = max(1, iters // 5)
    times = []
    for _ in range(3):
        t_lo = run_chain(lo)
        t_hi = run_chain(iters)
        times.append((t_hi - t_lo) / (iters - lo) * 1e3)
    return sorted(times)[1]


def sweep(versions: Dict[str, Callable], make_args: Callable[..., tuple],
          configs: Iterable[Tuple], ref_name: str,
          flops_fn: Callable[..., float] | None = None,
          bytes_fn: Callable[..., float] | None = None) -> None:
    """Run every version over every config; validate against `ref_name`
    and print a ms / GFLOP/s / GB/s table."""
    for cfg in configs:
        args = make_args(*cfg)
        ref = versions[ref_name]
        if isinstance(ref, tuple):
            ref = ref[0]
        print(f"-- config {cfg}")
        for name, fn in versions.items():
            skip_validate = False
            if isinstance(fn, tuple):  # (fn, {"validate": False, ...})
                fn, opts = fn
                skip_validate = not opts.get("validate", True)
            if name != ref_name and not skip_validate:
                validate_result(fn, ref, args, name=name)
            ms = benchmark(fn, args)
            extra = ""
            if flops_fn:
                extra += f"  {flops_fn(*cfg) / ms / 1e6:8.1f} GFLOP/s"
            if bytes_fn:
                extra += f"  {bytes_fn(*cfg) / ms / 1e6:8.1f} GB/s"
            print(f"[bench] {name:24s} {ms:8.3f} ms{extra}")
