"""Tensor/data parallelism tests on the virtual 8-device CPU mesh
(SURVEY.md §4.5: sharded kernel == single-device reference)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from llmc_paged_tpu import formats
from llmc_paged_tpu.config import GPT2Config, PageConfig
from llmc_paged_tpu.kv.layouts import init_pool, token_coords
from llmc_paged_tpu.kv.manager import BlockManager
from llmc_paged_tpu.models import gpt2, gpt2_paged
from llmc_paged_tpu.parallel import sharding as sh

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device CPU mesh")


@pytest.fixture(scope="module")
def golden(fixtures_dir):
    cfg, params_np = formats.read_checkpoint(
        os.path.join(fixtures_dir, "model_tiny.bin"))
    state = formats.read_debug_state(
        os.path.join(fixtures_dir, "state_tiny.bin"), cfg)
    return cfg, params_np, state


@pytest.mark.parametrize("tp", [2, 4])
def test_tp_decode_matches_single_device(golden, tp):
    cfg, params_np, state = golden
    mesh = sh.make_mesh(model=tp)
    page_cfg = PageConfig(page_size=8, num_pages=32, max_seqs=4,
                          pages_per_seq=4)
    B, T = 2, 12
    x = state["x"][:B, :T]

    # single-device reference: paged prefill + one decode step
    params_1 = gpt2.to_device(params_np, cfg)
    mgr = BlockManager(page_cfg.num_pages, page_cfg.page_size, 4)
    pool_1 = init_pool(cfg, page_cfg)
    for b in range(B):
        mgr.append_tokens(b, T - 1)
    tables = np.stack([mgr.block_table_array(b, page_cfg.pages_per_seq)
                       for b in range(B)])
    pos = np.tile(np.arange(T - 1), (B, 1)).astype(np.int32)
    pg, sl = token_coords(jnp.asarray(tables), jnp.asarray(pos),
                          page_cfg.page_size, jnp.ones((B, T - 1), bool),
                          page_cfg.num_pages)
    _, pool_1 = gpt2_paged.prefill_paged(params_1,
                                         jnp.asarray(x[:, :T - 1]), pg, sl,
                                         pool_1, cfg)
    dec_page, dec_slot = [], []
    for b in range(B):
        segs, _ = mgr.append_tokens(b, 1)
        dec_page.append(segs[0].page)
        dec_slot.append(segs[0].offset)
    tables = np.stack([mgr.block_table_array(b, page_cfg.pages_per_seq)
                       for b in range(B)])
    args = (jnp.asarray(x[:, T - 1]),
            jnp.full((B,), T - 1, jnp.int32),
            jnp.asarray(dec_page, dtype=jnp.int32),
            jnp.asarray(dec_slot, dtype=jnp.int32),
            jnp.asarray(tables),
            jnp.full((B,), T, jnp.int32))
    logits_1, _ = gpt2_paged.decode_step_paged(
        params_1, *args, pool_1, cfg, use_kernel=True)

    # TP: same flow through the sharded prefill + decode step
    params_tp = sh.prepare_tp_params(params_np, cfg, mesh)
    pool_tp = sh.shard_pool(init_pool(cfg, page_cfg), mesh)
    tp_prefill = sh.make_tp_prefill(cfg, mesh)
    tp_step = sh.make_tp_decode_step(cfg, mesh)
    _, pool_tp = tp_prefill(params_tp, jnp.asarray(x[:, :T - 1]), pg, sl,
                            pool_tp, jnp.full((B,), T - 2, jnp.int32))
    logits_tp, pool_tp_out = tp_step(
        params_tp, args[0], args[1], args[2], args[3], args[4], args[5],
        jnp.zeros((B,), jnp.int32), pool_tp)

    np.testing.assert_allclose(np.asarray(logits_tp), np.asarray(logits_1),
                               rtol=1e-4, atol=1e-4)


def test_tp_embed_and_logits_roundtrip(golden):
    """Vocab-sharded embedding + lm_head match the replicated versions."""
    cfg, params_np, state = golden
    mesh = sh.make_mesh(model=4)
    params_tp = sh.prepare_tp_params(params_np, cfg, mesh)
    params_1 = gpt2.to_device(params_np, cfg)
    toks = jnp.asarray(state["x"][0, :8])
    wpe_pos = jnp.arange(8, dtype=jnp.int32)

    from jax import shard_map
    vocab_shard = cfg.padded_vocab_size // 4

    def run(params, toks, wpe_pos):
        x = sh._tp_embed(params, toks, wpe_pos, "model", vocab_shard)
        return x, sh._tp_logits(params, x, "model", cfg)

    emb_tp, logits_tp = jax.jit(shard_map(
        run, mesh=mesh,
        in_specs=(sh._param_specs(quant_params=False), P(), P()),
        out_specs=(P(), P()), check_vma=False))(params_tp, toks, wpe_pos)

    emb_1 = params_1["wte"][toks] + params_1["wpe"][wpe_pos]
    np.testing.assert_allclose(np.asarray(emb_tp), np.asarray(emb_1),
                               rtol=1e-5, atol=1e-6)
    from llmc_paged_tpu.ops import layers as L
    logits_1 = gpt2._logits(emb_1, params_1, cfg)
    np.testing.assert_allclose(np.asarray(logits_tp), np.asarray(logits_1),
                               rtol=1e-4, atol=1e-5)


def test_dp_train_step_matches_single_device(golden):
    optax = pytest.importorskip("optax")
    cfg, params_np, state = golden
    mesh = sh.make_mesh(model=1, data=4)
    tx = optax.adamw(1e-4, b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.0)

    x, y = jnp.asarray(state["x"]), jnp.asarray(state["y"])  # B=4
    params_1 = gpt2.to_device(params_np, cfg)
    opt_1 = tx.init(params_1)
    loss_1, grads_1 = gpt2.grad_fn(params_1, x, y, cfg)

    step, shard_batch, replicate = sh.make_dp_train_step(cfg, mesh, tx)
    params_dp = replicate(gpt2.to_device(params_np, cfg))
    opt_dp = replicate(tx.init(params_dp))
    xd, yd = shard_batch(x, y)
    params_dp, opt_dp, loss_dp = step(params_dp, opt_dp, xd, yd, cfg)
    assert abs(float(loss_dp) - float(loss_1)) < 1e-5

    # one more step must also agree with the single-device trajectory
    upd, opt_1 = tx.update(grads_1, opt_1, params_1)
    params_1 = optax.apply_updates(params_1, upd)
    loss_1b = gpt2.loss_fn(params_1, x, y, cfg)
    _, _, loss_dp2 = step(params_dp, opt_dp, xd, yd, cfg)
    assert abs(float(loss_dp2) - float(loss_1b)) < 1e-5


def test_engine_tp_serving_matches_single_device(fixtures_dir):
    """InferenceEngine with EngineConfig.mesh_shape runs the whole
    continuous-batching loop through the shard_map TP step (config 5
    single-host slice); greedy tokens must equal the single-device
    engine's."""
    from llmc_paged_tpu import formats
    from llmc_paged_tpu.config import EngineConfig, PageConfig
    from llmc_paged_tpu.engine.engine import InferenceEngine
    from llmc_paged_tpu.engine.scheduler import Request

    cfg, params = formats.read_checkpoint(
        os.path.join(fixtures_dir, "model_tiny.bin"))
    stream = formats.read_token_stream(
        os.path.join(fixtures_dir, "tokens_tiny.bin"))
    prompts = [stream[i * 5: i * 5 + 7].tolist() for i in range(2)]
    page = PageConfig(page_size=8, num_pages=32, max_seqs=4, pages_per_seq=6)

    def run(mesh_shape):
        econf = EngineConfig(cache_mode="paged", page=page, greedy=True,
                             max_batch=2, mesh_shape=mesh_shape)
        eng = InferenceEngine(params, cfg, econf)
        done = eng.run([Request(rid=i, prompt=prompts[i], max_new_tokens=10)
                        for i in range(2)])
        return {r.rid: r.tokens for r in done}

    ref = run(None)
    tp = run({"model": 2})
    assert tp == ref


def test_engine_tp_device_sampling_topk1_equals_greedy(fixtures_dir):
    """TP chunked decode with on-device sampling: top_k=1 must reproduce
    the greedy stream exactly (replicated logits + replicated key →
    identical pick on every shard)."""
    from llmc_paged_tpu import formats
    from llmc_paged_tpu.config import EngineConfig, PageConfig
    from llmc_paged_tpu.engine.engine import InferenceEngine
    from llmc_paged_tpu.engine.scheduler import Request

    cfg, params = formats.read_checkpoint(
        os.path.join(fixtures_dir, "model_tiny.bin"))
    stream = formats.read_token_stream(
        os.path.join(fixtures_dir, "tokens_tiny.bin"))
    prompt = stream[:7].tolist()
    page = PageConfig(page_size=8, num_pages=32, max_seqs=4, pages_per_seq=6)

    def run(**kw):
        econf = EngineConfig(cache_mode="paged", page=page, max_batch=1,
                             mesh_shape={"model": 2}, decode_chunk=8, **kw)
        eng = InferenceEngine(params, cfg, econf)
        return eng.run([Request(rid=0, prompt=prompt,
                                max_new_tokens=12)])[0].tokens

    greedy = run(greedy=True)
    sampled = run(greedy=False, top_k=1, device_sampling=True)
    assert sampled == greedy


@pytest.mark.parametrize("param_dtype,kv_dtype", [
    ("int8", "int8"),          # the north-star serving configuration
    ("int8", "float32"),
])
def test_engine_tp_reduced_dtypes_match_single_device(fixtures_dir,
                                                      param_dtype, kv_dtype):
    """TP serving in the int8 combinations (the north star is 1.5B INT8
    params + INT8 KV pages, multi-chip): the whole engine loop — batched
    prefill, chunked decode, finish — through the shard_map steps must
    produce the same greedy tokens as the single-device engine in the
    SAME dtype config (int8 quantizes identical values in both layouts and
    accumulates in f32, so only psum partial-sum order differs — tokens
    stay equal; bf16 accumulation does flip greedy picks, so bf16 TP is
    covered by the determinism + logits tests below instead)."""
    from llmc_paged_tpu.config import EngineConfig, PageConfig
    from llmc_paged_tpu.engine.engine import InferenceEngine
    from llmc_paged_tpu.engine.scheduler import Request

    cfg, params = formats.read_checkpoint(
        os.path.join(fixtures_dir, "model_tiny.bin"))
    stream = formats.read_token_stream(
        os.path.join(fixtures_dir, "tokens_tiny.bin"))
    prompts = [stream[i * 5: i * 5 + 7].tolist() for i in range(2)]
    page = PageConfig(page_size=8, num_pages=32, max_seqs=4,
                      pages_per_seq=6, kv_dtype=kv_dtype)

    def run(mesh_shape):
        econf = EngineConfig(cache_mode="paged", page=page, greedy=True,
                             max_batch=2, decode_chunk=8,
                             param_dtype=param_dtype, mesh_shape=mesh_shape)
        eng = InferenceEngine(params, cfg, econf)
        done = eng.run([Request(rid=i, prompt=prompts[i], max_new_tokens=10)
                        for i in range(2)])
        return {r.rid: r.tokens for r in done}

    assert run({"model": 2}) == run(None)


def test_engine_tp_int8_bf16_prefill_copy(fixtures_dir):
    """prefill_param_dtype under TP: the engine keeps a second bf16
    TP-sharded weight pytree and a non-quant prefill step; decode stays
    on the int8 shards. bf16 prefill accumulation can flip greedy picks
    vs the f32-activation path, so (like the bf16 TP engine test) this
    gates executability + determinism, TP vs TP-again."""
    from llmc_paged_tpu.config import EngineConfig, PageConfig
    from llmc_paged_tpu.engine.engine import InferenceEngine
    from llmc_paged_tpu.engine.scheduler import Request

    cfg, params = formats.read_checkpoint(
        os.path.join(fixtures_dir, "model_tiny.bin"))
    stream = formats.read_token_stream(
        os.path.join(fixtures_dir, "tokens_tiny.bin"))
    prompts = [stream[i * 5: i * 5 + 7].tolist() for i in range(2)]
    page = PageConfig(page_size=8, num_pages=32, max_seqs=4,
                      pages_per_seq=6, kv_dtype="int8")

    def run():
        econf = EngineConfig(cache_mode="paged", page=page, greedy=True,
                             max_batch=2, decode_chunk=8,
                             param_dtype="int8",
                             prefill_param_dtype="bfloat16",
                             mesh_shape={"model": 2})
        eng = InferenceEngine(params, cfg, econf)
        assert "prefill_params" in eng._tp
        assert eng._tp["prefill_params"]["qkvw"].dtype == jnp.bfloat16
        assert eng._tp["params"]["qkvw"].dtype == jnp.int8
        done = eng.run([Request(rid=i, prompt=prompts[i],
                                max_new_tokens=10) for i in range(2)])
        return {r.rid: r.tokens for r in done}

    first = run()
    assert first == run()
    assert all(len(v) == len(p) + 10
               for v, p in zip(first.values(), prompts))


def test_engine_tp_bf16_deterministic_and_close(fixtures_dir):
    """bf16 TP serving: the engine loop must run the full bf16 shard_map
    path, be deterministic run-to-run, and stay close to the single-device
    bf16 stream (token equality is NOT guaranteed — bf16 psum partials
    round differently than the single-device full sum — so this asserts
    determinism plus a shared prefix; the numeric path itself is checked
    at logits level in test_tp_bf16_decode_step_logits_close)."""
    from llmc_paged_tpu.config import EngineConfig, PageConfig
    from llmc_paged_tpu.engine.engine import InferenceEngine
    from llmc_paged_tpu.engine.scheduler import Request

    cfg, params = formats.read_checkpoint(
        os.path.join(fixtures_dir, "model_tiny.bin"))
    stream = formats.read_token_stream(
        os.path.join(fixtures_dir, "tokens_tiny.bin"))
    prompt = stream[:7].tolist()
    page = PageConfig(page_size=8, num_pages=32, max_seqs=4,
                      pages_per_seq=6, kv_dtype="bfloat16")

    def run(mesh_shape):
        econf = EngineConfig(cache_mode="paged", page=page, greedy=True,
                             max_batch=1, decode_chunk=8,
                             param_dtype="bfloat16", mesh_shape=mesh_shape)
        eng = InferenceEngine(params, cfg, econf)
        return eng.run([Request(rid=0, prompt=prompt,
                                max_new_tokens=8)])[0].tokens

    a, b = run({"model": 2}), run({"model": 2})
    assert a == b and len(a) == len(prompt) + 8
    single = run(None)
    # the streams may diverge after a rounding-flip, but the first token
    # comes from a psum-free prefix-heavy computation and must agree
    assert a[: len(prompt) + 1] == single[: len(prompt) + 1]


def test_tp_bf16_decode_step_logits_close(golden):
    """Step-level bf16 TP vs single-device bf16 logits (bf16 has ~3
    significant decimal digits; psum reordering compounds that)."""
    cfg, params_np, state = golden
    mesh = sh.make_mesh(model=2)
    page_cfg = PageConfig(page_size=8, num_pages=32, max_seqs=4,
                          pages_per_seq=4)
    B, T = 2, 9
    x = state["x"][:B, :T]

    mgr = BlockManager(page_cfg.num_pages, page_cfg.page_size, 4)
    for b in range(B):
        mgr.append_tokens(b, T - 1)
    tables = np.stack([mgr.block_table_array(b, page_cfg.pages_per_seq)
                       for b in range(B)])
    pos = np.tile(np.arange(T - 1), (B, 1)).astype(np.int32)
    pg, sl = token_coords(jnp.asarray(tables), jnp.asarray(pos),
                          page_cfg.page_size, jnp.ones((B, T - 1), bool),
                          page_cfg.num_pages)
    dec = [mgr.append_tokens(b, 1)[0][0] for b in range(B)]
    tables = np.stack([mgr.block_table_array(b, page_cfg.pages_per_seq)
                       for b in range(B)])
    step_args = (jnp.asarray(x[:, T - 1]), jnp.full((B,), T - 1, jnp.int32),
                 jnp.asarray([s.page for s in dec], jnp.int32),
                 jnp.asarray([s.offset for s in dec], jnp.int32),
                 jnp.asarray(tables), jnp.full((B,), T, jnp.int32))

    params_1 = gpt2.to_device(params_np, cfg, jnp.bfloat16)
    pool_1 = init_pool(cfg, page_cfg, dtype=jnp.bfloat16)
    _, pool_1 = gpt2_paged.prefill_paged(params_1, jnp.asarray(x[:, :T - 1]),
                                         pg, sl, pool_1, cfg)
    logits_1, _ = gpt2_paged.decode_step_paged(
        params_1, *step_args, pool_1, cfg, use_kernel=True)

    params_tp = sh.prepare_tp_params(params_np, cfg, mesh,
                                     param_dtype="bfloat16")
    pool_tp = sh.shard_pool(init_pool(cfg, page_cfg, dtype=jnp.bfloat16),
                            mesh)
    tp_prefill = sh.make_tp_prefill(cfg, mesh)
    tp_step = sh.make_tp_decode_step(cfg, mesh)
    _, pool_tp = tp_prefill(params_tp, jnp.asarray(x[:, :T - 1]), pg, sl,
                            pool_tp, jnp.full((B,), T - 2, jnp.int32))
    logits_tp, _ = tp_step(params_tp, *step_args,
                           jnp.zeros((B,), jnp.int32), pool_tp)

    np.testing.assert_allclose(
        np.asarray(logits_tp, np.float32), np.asarray(logits_1, np.float32),
        rtol=0.05, atol=0.05)


def test_tp_int8_decode_step_logits_close(golden):
    """Step-level check at TP=4: int8 TP decode logits vs int8
    single-device decode logits (identical quantized values, different
    partial-sum order → tight float tolerance)."""
    from llmc_paged_tpu.ops.int8 import quantize_params

    cfg, params_np, state = golden
    mesh = sh.make_mesh(model=4)
    page_cfg = PageConfig(page_size=8, num_pages=32, max_seqs=4,
                          pages_per_seq=4)
    B, T = 2, 9
    x = state["x"][:B, :T]

    def setup_coords():
        mgr = BlockManager(page_cfg.num_pages, page_cfg.page_size, 4)
        for b in range(B):
            mgr.append_tokens(b, T - 1)
        tables = np.stack([mgr.block_table_array(b, page_cfg.pages_per_seq)
                           for b in range(B)])
        pos = np.tile(np.arange(T - 1), (B, 1)).astype(np.int32)
        pg, sl = token_coords(jnp.asarray(tables), jnp.asarray(pos),
                              page_cfg.page_size, jnp.ones((B, T - 1), bool),
                              page_cfg.num_pages)
        dec = [mgr.append_tokens(b, 1)[0][0] for b in range(B)]
        tables = np.stack([mgr.block_table_array(b, page_cfg.pages_per_seq)
                           for b in range(B)])
        return pg, sl, tables, dec

    pg, sl, tables, dec = setup_coords()
    dec_page = jnp.asarray([s.page for s in dec], jnp.int32)
    dec_slot = jnp.asarray([s.offset for s in dec], jnp.int32)
    step_args = (jnp.asarray(x[:, T - 1]), jnp.full((B,), T - 1, jnp.int32),
                 dec_page, dec_slot, jnp.asarray(tables),
                 jnp.full((B,), T, jnp.int32))

    # single-device int8 params + int8 KV
    params_1 = quantize_params(gpt2.to_device(params_np, cfg))
    pool_1 = init_pool(cfg, page_cfg, dtype="int8")
    _, pool_1 = gpt2_paged.prefill_paged(params_1, jnp.asarray(x[:, :T - 1]),
                                         pg, sl, pool_1, cfg)
    logits_1, _ = gpt2_paged.decode_step_paged(
        params_1, *step_args, pool_1, cfg, use_kernel=True)

    # TP int8 params + int8 KV
    params_tp = sh.prepare_tp_params(params_np, cfg, mesh,
                                     param_dtype="int8")
    pool_tp = sh.shard_pool(init_pool(cfg, page_cfg, dtype="int8"), mesh)
    tp_prefill = sh.make_tp_prefill(cfg, mesh, quant_params=True,
                                    kv_quant=True)
    tp_step = sh.make_tp_decode_step(cfg, mesh, quant_params=True,
                                     kv_quant=True)
    _, pool_tp = tp_prefill(params_tp, jnp.asarray(x[:, :T - 1]), pg, sl,
                            pool_tp, jnp.full((B,), T - 2, jnp.int32))
    logits_tp, _ = tp_step(params_tp, *step_args,
                           jnp.zeros((B,), jnp.int32), pool_tp)

    np.testing.assert_allclose(np.asarray(logits_tp), np.asarray(logits_1),
                               rtol=1e-4, atol=1e-4)


def test_engine_tp_window_matches_single_device(fixtures_dir):
    """Sliding-window decode under tensor parallelism (window-relative
    positions + starts flow through the shard_map chunk) must equal the
    single-device engine, including a prompt longer than the window."""
    from llmc_paged_tpu import formats
    from llmc_paged_tpu.config import EngineConfig, PageConfig
    from llmc_paged_tpu.engine.engine import InferenceEngine
    from llmc_paged_tpu.engine.scheduler import Request

    cfg, params = formats.read_checkpoint(
        os.path.join(fixtures_dir, "model_tiny.bin"))
    stream = formats.read_token_stream(
        os.path.join(fixtures_dir, "tokens_tiny.bin"))
    prompt = stream[:14].tolist()   # > window → truncation path too
    page = PageConfig(page_size=8, num_pages=32, max_seqs=4, pages_per_seq=6)

    def run(mesh_shape):
        econf = EngineConfig(cache_mode="paged", page=page, max_batch=1,
                             greedy=True, decode_chunk=8,
                             mesh_shape=mesh_shape)
        eng = InferenceEngine(params, cfg, econf)
        done = eng.run([Request(rid=0, prompt=prompt, max_new_tokens=12)],
                       window=8)
        return done[0].tokens

    assert run({"model": 2}) == run(None)


def _prefix_reqs(vocab=128, seed=11):
    rng = np.random.default_rng(seed)
    sys_prompt = rng.integers(0, vocab, 24).tolist()  # 3 full pages @ ps=8
    return [sys_prompt + rng.integers(0, vocab, int(n)).tolist()
            for n in (5, 9, 3, 7, 6, 4)]


def _run_prefix_engine(params, cfg, reqs, *, mesh_shape, prefix,
                       param_dtype="float32", kv_dtype="float32", runs=1):
    from llmc_paged_tpu.config import EngineConfig
    from llmc_paged_tpu.engine.engine import InferenceEngine
    from llmc_paged_tpu.engine.scheduler import Request

    page = PageConfig(page_size=8, num_pages=48, max_seqs=8,
                      pages_per_seq=10, kv_dtype=kv_dtype,
                      prefix_cache=prefix)
    econf = EngineConfig(cache_mode="paged", page=page, greedy=True,
                         max_batch=3, decode_chunk=4,
                         mesh_shape=mesh_shape, param_dtype=param_dtype,
                         activation_dtype=("bfloat16"
                                           if param_dtype == "int8"
                                           else "float32"))
    eng = InferenceEngine(params, cfg, econf)
    outs = []
    for _ in range(runs):
        done = eng.run([Request(rid=i, prompt=list(p), max_new_tokens=10)
                        for i, p in enumerate(reqs)])
        assert len(done) == len(reqs)
        outs.append({r.rid: r.tokens for r in done})
    return outs, dict(eng.stats)


def _run_spec_engine(params, cfg, reqs, *, mesh_shape, spec_k,
                     param_dtype="float32", kv_dtype="float32"):
    from llmc_paged_tpu.config import EngineConfig
    from llmc_paged_tpu.engine.engine import InferenceEngine
    from llmc_paged_tpu.engine.scheduler import Request

    page = PageConfig(page_size=8, num_pages=64, max_seqs=8,
                      pages_per_seq=12, kv_dtype=kv_dtype)
    econf = EngineConfig(cache_mode="paged", page=page, greedy=True,
                         max_batch=4, decode_chunk=3 if spec_k else 6,
                         spec_k=spec_k, mesh_shape=mesh_shape,
                         param_dtype=param_dtype,
                         activation_dtype=("bfloat16"
                                           if param_dtype == "int8"
                                           else "float32"))
    eng = InferenceEngine(params, cfg, econf)
    done = eng.run([Request(rid=i, prompt=list(p), max_new_tokens=12)
                    for i, p in enumerate(reqs)])
    assert len(done) == len(reqs)
    return {r.rid: r.tokens for r in done}, dict(eng.stats)


@pytest.mark.parametrize("dtypes", [("float32", "float32"),
                                    ("int8", "int8")])
def test_engine_tp_spec_decode_token_equality(dtypes):
    """Speculative decoding under tensor parallelism (VERDICT r4 #6):
    drafting/verify/acceptance inside the shard_map'd scan must emit the
    SAME greedy stream as (a) plain TP decode without speculation and
    (b) the single-device spec engine — spec is greedy-exact by
    construction, TP must not break that. CPU interpret mode is
    deterministic, so raw == comparison is valid here."""
    param_dtype, kv_dtype = dtypes
    cfg = GPT2Config.tiny(max_seq_len=128, vocab_size=96, num_layers=2,
                          num_heads=4, channels=32)
    params = jax.tree.map(
        np.asarray, gpt2.init_params(cfg, jax.random.PRNGKey(2)))
    rng = np.random.default_rng(7)
    # repetitive prompts give the n-gram drafter real acceptance
    base = rng.integers(0, 96, 6).tolist()
    reqs = [base * 3 + rng.integers(0, 96, int(n)).tolist()
            for n in (3, 5, 2, 7)]
    plain_tp, _ = _run_spec_engine(params, cfg, reqs,
                                   mesh_shape={"model": 2}, spec_k=0,
                                   param_dtype=param_dtype,
                                   kv_dtype=kv_dtype)
    spec_1, st1 = _run_spec_engine(params, cfg, reqs, mesh_shape=None,
                                   spec_k=3, param_dtype=param_dtype,
                                   kv_dtype=kv_dtype)
    spec_tp, st = _run_spec_engine(params, cfg, reqs,
                                   mesh_shape={"model": 2}, spec_k=3,
                                   param_dtype=param_dtype,
                                   kv_dtype=kv_dtype)
    assert spec_tp == plain_tp, "TP spec diverged from plain TP greedy"
    assert spec_tp == spec_1, "TP spec diverged from single-device spec"
    assert st["spec_tok_per_step"] > 1.0, st   # drafts actually accepted


@pytest.mark.parametrize("tp", [2, 4])
def test_engine_tp_prefix_cache_token_equality(tp):
    """Prefix caching under tensor parallelism (VERDICT r4 #6): the TP
    suffix prefill (sharded mq parts over adopted pages) must produce
    the same greedy tokens as (a) the single-device prefix-cache engine
    and (b) the plain TP engine without caching — within a run (later
    waves adopt wave 1's system-prompt pages) and across run() calls
    (manager + pool persist). Head-sharded pool pages adopt by block-
    table metadata only, so hits cost zero data movement per shard."""
    cfg = GPT2Config.tiny(max_seq_len=128, vocab_size=128, num_layers=2,
                          num_heads=4, channels=32)
    params = jax.tree.map(
        np.asarray, gpt2.init_params(cfg, jax.random.PRNGKey(0)))
    reqs = _prefix_reqs()
    base_tp, _ = _run_prefix_engine(params, cfg, reqs,
                                    mesh_shape={"model": tp}, prefix=False)
    base_1, _ = _run_prefix_engine(params, cfg, reqs, mesh_shape=None,
                                   prefix=True, runs=1)
    pc, stats = _run_prefix_engine(params, cfg, reqs,
                                   mesh_shape={"model": tp}, prefix=True,
                                   runs=2)
    assert pc[0] == base_tp[0], "TP prefix run diverged from plain TP"
    assert pc[0] == base_1[0], "TP prefix run diverged from single-device"
    assert pc[1] == pc[0], "second TP run diverged (stale cached K/V?)"
    assert stats["prefix_hit_pages"] >= 18, stats
    assert stats["prefix_pages_registered"] == 0


def test_engine_tp_prefix_cache_int8():
    """The north-star combination: int8 weights + int8 KV + TP=2 +
    prefix caching. CPU interpret mode is deterministic, so greedy
    tokens must match the plain TP int8 engine exactly and the second
    (all-hit) run must reproduce the first."""
    cfg = GPT2Config.tiny(max_seq_len=128, vocab_size=128, num_layers=2,
                          num_heads=4, channels=32)
    params = jax.tree.map(
        np.asarray, gpt2.init_params(cfg, jax.random.PRNGKey(0)))
    reqs = _prefix_reqs()
    base_tp, _ = _run_prefix_engine(params, cfg, reqs,
                                    mesh_shape={"model": 2}, prefix=False,
                                    param_dtype="int8", kv_dtype="int8")
    pc, stats = _run_prefix_engine(params, cfg, reqs,
                                   mesh_shape={"model": 2}, prefix=True,
                                   param_dtype="int8", kv_dtype="int8",
                                   runs=2)
    assert pc[0] == base_tp[0]
    assert pc[1] == pc[0]
    assert stats["prefix_hit_pages"] >= 18, stats
