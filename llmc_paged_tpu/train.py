"""Training driver — the capability of the reference's CPU trainers
(train_gpt2.c main :1148-1252 and the full-depth train_scratch.c), as a
jitted optax loop with optional data parallelism.

Loop structure mirrors the reference main: every `val_every` steps a val
loss over `val_batches` batches (train_gpt2.c:1185-1195), every
`sample_every` steps an autoregressive sample (:1198-1230), otherwise a
timed AdamW step (:1233-1241, gpt2_update hyperparameters :922-948).
Unlike the C code (load-only), checkpoints can be written back in the
byte-exact reference format via formats.write_checkpoint.
"""

from __future__ import annotations

import argparse
import os
import time
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from llmc_paged_tpu import formats
from llmc_paged_tpu.config import GPT2Config
from llmc_paged_tpu.models import gpt2
from llmc_paged_tpu.sampler import Sampler
from llmc_paged_tpu.tokenizer import Tokenizer
from llmc_paged_tpu.utils.dataloader import DataLoader


def train(cfg: GPT2Config, params, train_loader: DataLoader,
          val_loader: Optional[DataLoader] = None, steps: int = 40,
          lr: float = 1e-4, weight_decay: float = 0.0,
          val_every: int = 10, val_batches: int = 5,
          sample_every: int = 20, sample_tokens: int = 16,
          tokenizer: Optional[Tokenizer] = None, seed: int = 1337,
          data_parallel: int = 1, log=print):
    """Run the training loop; returns (params, list of per-step losses)."""
    import optax

    tx = optax.adamw(lr, b1=0.9, b2=0.999, eps=1e-8,
                     weight_decay=weight_decay)
    opt_state = tx.init(params)

    if data_parallel > 1:
        from llmc_paged_tpu.parallel import sharding as sh
        mesh = sh.make_mesh(model=1, data=data_parallel)
        step_fn, shard_batch, replicate = sh.make_dp_train_step(cfg, mesh, tx)
        params = replicate(params)
        opt_state = replicate(opt_state)
    else:
        @jax.jit
        def _step(params, opt_state, x, y):
            loss, grads = jax.value_and_grad(gpt2.loss_fn)(params, x, y, cfg)
            updates, opt_state = tx.update(grads, opt_state, params)
            return jax.tree.map(lambda p, u: p + u, params, updates), \
                opt_state, loss

        def step_fn(params, opt_state, x, y, _cfg):
            return _step(params, opt_state, x, y)

        def shard_batch(x, y):
            return x, y

    sampler = Sampler(seed)
    losses = []
    for step in range(steps):
        if val_loader is not None and step % val_every == 0:
            val_loader.reset()
            val_loss = float(np.mean([
                float(gpt2.loss_fn(params, *map(jnp.asarray,
                                                val_loader.next_batch()), cfg))
                for _ in range(val_batches)]))
            log(f"step {step}: val loss {val_loss:.6f}")
        if sample_every and step % sample_every == 0 and step > 0:
            toks = [50256 % cfg.vocab_size]  # GPT-2 EOT when vocab allows
            for _ in range(sample_tokens):
                ctx = toks[-cfg.max_seq_len:]
                logits = gpt2.forward(params,
                                      jnp.asarray([ctx], jnp.int32), cfg)
                probs = jax.nn.softmax(logits[0, -1])
                toks.append(sampler.sample(np.asarray(probs)))
            text = tokenizer.decode_string(toks) if tokenizer else str(toks)
            log(f"step {step} sample: {text!r}")
        x, y = train_loader.next_batch()
        xd, yd = shard_batch(jnp.asarray(x), jnp.asarray(y))
        t0 = time.monotonic()
        params, opt_state, loss = step_fn(params, opt_state, xd, yd, cfg)
        loss = float(loss)
        losses.append(loss)
        log(f"step {step}: train loss {loss:.6f} "
            f"(took {(time.monotonic() - t0) * 1e3:.2f} ms)")
    return params, losses


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="llmc_paged_tpu.train")
    ap.add_argument("--checkpoint", default=None,
                    help="init from a model .bin; omit for from-scratch")
    ap.add_argument("--train-data", required=True)
    ap.add_argument("--val-data", default=None)
    ap.add_argument("--tokenizer", default=None)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--seq-len", type=int, default=64)
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--weight-decay", type=float, default=0.0)
    ap.add_argument("--val-every", type=int, default=10)
    ap.add_argument("--sample-every", type=int, default=20)
    ap.add_argument("--data-parallel", type=int, default=1)
    ap.add_argument("--save", default=None,
                    help="write the trained model as a reference-format .bin")
    # from-scratch model shape (ignored with --checkpoint)
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--heads", type=int, default=4)
    ap.add_argument("--channels", type=int, default=128)
    ap.add_argument("--vocab", type=int, default=50257)
    ap.add_argument("--max-seq-len", type=int, default=1024)
    ap.add_argument("--seed", type=int, default=1337)
    args = ap.parse_args(argv)

    if os.environ.get("LLMC_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["LLMC_PLATFORM"])
    if os.environ.get("LLMC_NUM_CPU_DEVICES"):
        jax.config.update("jax_num_cpu_devices",
                          int(os.environ["LLMC_NUM_CPU_DEVICES"]))

    if args.checkpoint:
        cfg, params_np = formats.read_checkpoint(args.checkpoint)
        params = gpt2.to_device(params_np, cfg)
    else:
        cfg = GPT2Config(max_seq_len=args.max_seq_len, vocab_size=args.vocab,
                         num_layers=args.layers, num_heads=args.heads,
                         channels=args.channels)
        params = gpt2.init_params(cfg, jax.random.PRNGKey(args.seed))

    train_loader = DataLoader(args.train_data, args.batch, args.seq_len)
    val_loader = DataLoader(args.val_data, args.batch, args.seq_len) \
        if args.val_data else None
    tok = Tokenizer.from_file(args.tokenizer) if args.tokenizer else None

    params, _ = train(cfg, params, train_loader, val_loader,
                      steps=args.steps, lr=args.lr,
                      weight_decay=args.weight_decay,
                      val_every=args.val_every,
                      sample_every=args.sample_every, tokenizer=tok,
                      seed=args.seed, data_parallel=args.data_parallel)

    if args.save:
        host = {k: np.asarray(v)[: cfg.vocab_size] if k == "wte"
                else np.asarray(v) for k, v in params.items()}
        formats.write_checkpoint(args.save, cfg, host, "float32")
        print(f"saved {args.save}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
