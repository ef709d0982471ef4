"""Import HuggingFace GPT-2 weights into the reference checkpoint format.

The reference's importer is GPT.from_pretrained (train_gpt2.py:148-195):
copy the HF state dict, transposing the Conv1D weights (c_attn / c_proj /
c_fc use (in, out) layout) into the (out, in) convention that both the C
reader and this framework use; write_model then emits the .bin checkpoint
(train_gpt2.py:300-326).

This environment has no network egress, so the importer works from
*local* weights only:

    python tools/import_hf.py --model /path/to/hf-gpt2-dir --out gpt2.bin
    python tools/import_hf.py --model gpt2 --out gpt2.bin   # local HF cache

Optionally also writes the tokenizer .bin (magic 20240328) from the HF
tokenizer's byte-level vocab, and a bf16 (version 2) checkpoint with
--dtype bfloat16.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from llmc_paged_tpu import formats  # noqa: E402
from llmc_paged_tpu.config import GPT2Config  # noqa: E402

# HF GPT2 Conv1D modules whose weights are stored (in, out) and must be
# transposed to our (out, in) convention (train_gpt2.py:174-186).
_TRANSPOSED = ("attn.c_attn.weight", "attn.c_proj.weight",
               "mlp.c_fc.weight", "mlp.c_proj.weight")


def params_from_state_dict(sd, cfg: GPT2Config) -> dict:
    """Map an HF GPT2LMHeadModel state dict onto the framework's stacked
    pytree (formats.PARAM_SPECS layout)."""
    def g(name):
        t = sd[name]
        try:
            t = t.detach().cpu().numpy()
        except AttributeError:
            t = np.asarray(t)
        return t.astype(np.float32)

    pfx = "transformer." if any(k.startswith("transformer.") for k in sd) \
        else ""
    L = cfg.num_layers
    params = {
        "wte": g(f"{pfx}wte.weight")[: cfg.vocab_size],
        "wpe": g(f"{pfx}wpe.weight"),
        "lnfw": g(f"{pfx}ln_f.weight"),
        "lnfb": g(f"{pfx}ln_f.bias"),
    }
    per_layer = {
        "ln1w": "ln_1.weight", "ln1b": "ln_1.bias",
        "qkvw": "attn.c_attn.weight", "qkvb": "attn.c_attn.bias",
        "attprojw": "attn.c_proj.weight", "attprojb": "attn.c_proj.bias",
        "ln2w": "ln_2.weight", "ln2b": "ln_2.bias",
        "fcw": "mlp.c_fc.weight", "fcb": "mlp.c_fc.bias",
        "fcprojw": "mlp.c_proj.weight", "fcprojb": "mlp.c_proj.bias",
    }
    for ours, theirs in per_layer.items():
        rows = []
        for layer in range(L):
            t = g(f"{pfx}h.{layer}.{theirs}")
            if theirs in _TRANSPOSED:
                t = t.T.copy()
            rows.append(t)
        params[ours] = np.stack(rows)
    shapes = formats.param_shapes(cfg)
    for k, v in params.items():
        assert v.shape == shapes[k], (k, v.shape, shapes[k])
    return params


def config_from_hf(hf_cfg) -> GPT2Config:
    return GPT2Config(max_seq_len=hf_cfg.n_positions,
                      vocab_size=hf_cfg.vocab_size,
                      num_layers=hf_cfg.n_layer,
                      num_heads=hf_cfg.n_head,
                      channels=hf_cfg.n_embd)


def load_hf_model(model: str):
    """Local-only load: a directory with config.json + weights, or a model
    id already present in the HF cache."""
    from transformers import GPT2LMHeadModel

    return GPT2LMHeadModel.from_pretrained(model, local_files_only=True)


def tokenizer_table_from_hf(model: str):
    """GPT-2's byte-level BPE vocab → raw byte strings per token id, the
    tokenizer .bin payload (write_tokenizer, train_gpt2.py:353-367)."""
    from transformers import GPT2Tokenizer

    tok = GPT2Tokenizer.from_pretrained(model, local_files_only=True)
    byte_decoder = {v: k for k, v in tok.byte_encoder.items()}
    table = []
    for i in range(len(tok)):
        token = tok.convert_ids_to_tokens(i)
        table.append(bytes(byte_decoder[c] for c in token))
    return table


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True,
                    help="HF model dir or cached model id (gpt2, gpt2-xl, …)")
    ap.add_argument("--out", required=True, help="output checkpoint .bin")
    ap.add_argument("--dtype", choices=["float32", "bfloat16"],
                    default="float32")
    ap.add_argument("--tokenizer-out", default=None,
                    help="also write the tokenizer .bin here")
    args = ap.parse_args()

    model = load_hf_model(args.model)
    cfg = config_from_hf(model.config)
    params = params_from_state_dict(model.state_dict(), cfg)
    formats.write_checkpoint(args.out, cfg, params, dtype=args.dtype)
    print(f"wrote {args.out}: L={cfg.num_layers} NH={cfg.num_heads} "
          f"C={cfg.channels} V={cfg.vocab_size} ({args.dtype})")
    if args.tokenizer_out:
        formats.write_tokenizer_bin(args.tokenizer_out,
                                    tokenizer_table_from_hf(args.model))
        print(f"wrote {args.tokenizer_out}")


if __name__ == "__main__":
    main()
