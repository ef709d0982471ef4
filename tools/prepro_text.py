"""Offline data prep — the role of prepro_tinyshakespeare.py /
prepro_tinystories.py without network access: tokenize a LOCAL text file
into raw int32 train/val streams plus a tokenizer .bin.

Like the reference (prepro_tinyshakespeare.py:61-67): documents are split
on a delimiter, each document is prefixed with the end-of-text token, and
the first `val_tokens` tokens become the val split.

Tokenizer: tiktoken's GPT-2 encoder when its cached BPE files are
available; otherwise a byte-level fallback (vocab 257: one token per byte +
an EOT token) so the whole pipeline works fully offline.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from llmc_paged_tpu import formats  # noqa: E402


def byte_encoder():
    eot = 256
    table = [bytes([i]) if i else b"\x00" for i in range(256)]
    table.append(b"<|endoftext|>")

    def encode(text: str):
        return list(text.encode("utf-8"))

    return encode, eot, table


def tiktoken_encoder():
    import tiktoken
    enc = tiktoken.get_encoding("gpt2")
    table = [enc.decode_bytes([i]) or b"\x00"
             for i in range(enc.max_token_value + 1)]

    def encode(text: str):
        return enc.encode_ordinary(text)

    return encode, enc.eot_token, table


def _encode_shard(encoder_choice: str, docs):
    """Worker: tokenize a list of documents (module-level for pickling)."""
    if encoder_choice in ("auto", "tiktoken"):
        try:
            encode, _, _ = tiktoken_encoder()
        except Exception:
            if encoder_choice == "tiktoken":
                raise
            encode, _, _ = byte_encoder()
    else:
        encode, _, _ = byte_encoder()
    return [encode(d) for d in docs]


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="prepro_text")
    ap.add_argument("input", help="local UTF-8 text file")
    ap.add_argument("--out-prefix", default=None,
                    help="output prefix (default: input path sans extension)")
    ap.add_argument("--val-tokens", type=int, default=32768,
                    help="leading tokens reserved for val "
                         "(prepro_tinyshakespeare.py:67)")
    ap.add_argument("--doc-delimiter", default="\n\n",
                    help="document split; each doc is EOT-prefixed")
    ap.add_argument("--encoder", choices=["auto", "tiktoken", "byte"],
                    default="auto")
    ap.add_argument("--workers", type=int, default=1,
                    help="parallel document tokenization over a process "
                         "pool (prepro_tinystories.py:104-108 shard "
                         "pattern); documents are re-joined in order")
    args = ap.parse_args(argv)

    prefix = args.out_prefix or os.path.splitext(args.input)[0]
    with open(args.input, encoding="utf-8") as f:
        text = f.read()

    encode = None
    if args.encoder in ("auto", "tiktoken"):
        try:
            encode, eot, table = tiktoken_encoder()
            name = "tiktoken-gpt2"
        except Exception:
            if args.encoder == "tiktoken":
                raise
    if encode is None:
        encode, eot, table = byte_encoder()
        name = "byte-fallback"

    docs = [d for d in text.split(args.doc_delimiter) if d.strip()]
    if args.workers > 1:
        # shard documents over a process pool, order-preserving
        # (the reference tokenizes TinyStories shards the same way,
        # prepro_tinystories.py:104-108)
        from concurrent.futures import ProcessPoolExecutor
        from functools import partial

        # pass the parent's RESOLVED encoder so a worker cannot silently
        # fall back to a different vocabulary mid-stream
        worker = partial(_encode_shard,
                         "tiktoken" if name == "tiktoken-gpt2" else "byte")
        shards = [docs[i:: args.workers] for i in range(args.workers)]
        with ProcessPoolExecutor(max_workers=args.workers) as pool:
            per_shard = list(pool.map(worker, shards))
        # round-robin reassembly back to document order
        by_doc = [None] * len(docs)
        for w, shard_tokens in enumerate(per_shard):
            for j, doc_tokens in enumerate(shard_tokens):
                by_doc[w + j * args.workers] = doc_tokens
        tokens = []
        for doc_tokens in by_doc:
            tokens.append(eot)
            tokens.extend(doc_tokens)
    else:
        tokens = []
        for doc in docs:
            tokens.append(eot)
            tokens.extend(encode(doc))
    tokens = np.asarray(tokens, dtype=np.int32)

    val = tokens[: args.val_tokens]
    train = tokens[args.val_tokens:]
    if len(train) == 0:
        train, val = tokens, tokens[: max(1, len(tokens) // 10)]
    formats.write_token_stream(f"{prefix}_train.bin", train)
    formats.write_token_stream(f"{prefix}_val.bin", val)
    formats.write_tokenizer_bin(f"{prefix}_tokenizer.bin", table)
    print(f"encoder={name} total={len(tokens)} train={len(train)} "
          f"val={len(val)} → {prefix}_{{train,val,tokenizer}}.bin")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
