"""ctypes binding for the native (C++) block manager in csrc/.

The native runtime mirrors the role the reference's C state machine plays
(block_manager.c) — metadata only; page data stays on-device. Build with
`make -C csrc` (done automatically on first use if a compiler is present).
`make_block_manager` returns the native manager when available, else the
pure-Python one; both expose the same API and are equivalence-tested.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

from llmc_paged_tpu.kv.manager import BlockManager, Segment

_CSRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc")
_LIB_PATH = os.path.join(_CSRC, "libpagedrt.so")
_lib = None


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    src = os.path.join(_CSRC, "block_manager.cpp")
    stale = (not os.path.exists(_LIB_PATH)
             or (os.path.exists(src)
                 and os.path.getmtime(_LIB_PATH) < os.path.getmtime(src)))
    if stale:
        try:
            subprocess.run(["make", "-B", "-C", _CSRC], check=True,
                           capture_output=True)
        except (OSError, subprocess.CalledProcessError) as e:
            raise ImportError(f"cannot build libpagedrt.so: {e}") from e
    lib = ctypes.CDLL(_LIB_PATH)
    i32, i64, p = ctypes.c_int32, ctypes.c_int64, ctypes.c_void_p
    ip = ctypes.POINTER(ctypes.c_int32)
    lp = ctypes.POINTER(ctypes.c_int64)
    lib.bm_create.restype = p
    lib.bm_create.argtypes = [i32, i32, i32]
    lib.bm_destroy.argtypes = [p]
    lib.bm_request_block.restype = i32
    lib.bm_request_block.argtypes = [p, i32, ip]
    lib.bm_free_prompt.argtypes = [p, i32]
    lib.bm_current_block.restype = i32
    lib.bm_current_block.argtypes = [p, i32]
    lib.bm_append_tokens.restype = i32
    lib.bm_append_tokens.argtypes = [p, i32, i32, ip, ip, ip, i32, ip, ip]
    lib.bm_block_table.restype = i32
    lib.bm_block_table.argtypes = [p, i32, ip, i32]
    lib.bm_seq_len.restype = i32
    lib.bm_seq_len.argtypes = [p, i32]
    lib.bm_release_below.restype = i32
    lib.bm_release_below.argtypes = [p, i32, i32]
    lib.bm_truncate_to.restype = i32
    lib.bm_truncate_to.argtypes = [p, i32, i32]
    lib.bm_num_free.restype = i32
    lib.bm_num_free.argtypes = [p]
    lib.bm_lru_epoch.restype = i64
    lib.bm_lru_epoch.argtypes = [p]
    lib.bm_page_meta.restype = i32
    lib.bm_page_meta.argtypes = [p, i32, ip, ip, lp]
    lib.pm_create.restype = p
    lib.pm_create.argtypes = [i32, i32, i32]
    lib.pm_match_prefix.restype = i32
    lib.pm_match_prefix.argtypes = [p, ip, i32, ip, i32]
    lib.pm_adopt.restype = i32
    lib.pm_adopt.argtypes = [p, i32, ip, i32]
    lib.pm_register_prompt.restype = i32
    lib.pm_register_prompt.argtypes = [p, i32, ip, i32]
    lib.pm_num_cached.restype = i32
    lib.pm_num_cached.argtypes = [p]
    lib.pm_holders.restype = i32
    lib.pm_holders.argtypes = [p, i32, ip, i32]
    _lib = lib
    return lib


def _int_array(vals) -> "ctypes.Array":
    arr = (ctypes.c_int32 * len(vals))()
    for i, v in enumerate(vals):
        arr[i] = int(v)
    return arr


class NativeBlockManager:
    """Same API as kv.manager.BlockManager, backed by csrc/libpagedrt.so."""

    def __init__(self, num_pages: int = 100, page_size: int = 32,
                 max_seqs: int = 100):
        self._lib = _load_lib()
        self.num_pages = num_pages
        self.page_size = page_size
        self.max_seqs = max_seqs
        self._h = self._lib.bm_create(num_pages, page_size, max_seqs)

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.bm_destroy(self._h)
            self._h = None

    @property
    def lru_epoch(self) -> int:
        return int(self._lib.bm_lru_epoch(self._h))

    def page_meta(self, page: int) -> Tuple[int, int, int]:
        pid = ctypes.c_int32()
        filled = ctypes.c_int32()
        lru = ctypes.c_int64()
        rc = self._lib.bm_page_meta(self._h, page, ctypes.byref(pid),
                                    ctypes.byref(filled), ctypes.byref(lru))
        assert rc == 0
        return pid.value, filled.value, lru.value

    def block_table(self, prompt_id: int, cap: int | None = None
                    ) -> List[int]:
        # a window-reclaimed table can hold MORE entries than num_pages
        # (tombstones keep absolute indices), so grow the buffer on
        # overflow (-1 with a valid prompt id means cap was too small)
        self._check_prompt(prompt_id)
        cap = cap or self.num_pages
        while True:
            out = (ctypes.c_int32 * cap)()
            n = self._lib.bm_block_table(self._h, prompt_id, out, cap)
            if n >= 0:
                return list(out[:n])
            cap *= 2

    def block_table_array(self, prompt_id: int, pages_per_seq: int,
                          fill: int = 0) -> np.ndarray:
        from llmc_paged_tpu.kv.manager import _fill_tombstones
        table = self.block_table(prompt_id, cap=pages_per_seq)
        assert len(table) <= pages_per_seq
        row = np.full(pages_per_seq, fill, dtype=np.int32)
        row[: len(table)] = _fill_tombstones(table, fill)
        return row

    def get_current_block(self, prompt_id: int) -> Optional[int]:
        cur = self._lib.bm_current_block(self._h, prompt_id)
        return None if cur == -1 else cur

    def seq_len(self, prompt_id: int) -> int:
        return self._lib.bm_seq_len(self._h, prompt_id)

    def num_free(self) -> int:
        return self._lib.bm_num_free(self._h)

    def free_prompt(self, prompt_id: int) -> None:
        self._lib.bm_free_prompt(self._h, prompt_id)

    def release_below(self, prompt_id: int, start_pos: int) -> int:
        if start_pos >= self.seq_len(prompt_id):
            # same contract as the Python model: releasing at/beyond
            # seq_len would tombstone the live tail page (see
            # kv/manager.py release_below)
            raise ValueError(
                f"release_below({start_pos}) >= seq_len"
                f" {self.seq_len(prompt_id)} would tombstone the live "
                "tail page")
        n = self._lib.bm_release_below(self._h, prompt_id, start_pos)
        assert n >= 0
        return n

    def truncate_to(self, prompt_id: int, new_len: int) -> int:
        n = self._lib.bm_truncate_to(self._h, prompt_id, new_len)
        if n < 0:
            raise ValueError(
                f"truncate_to({new_len}): invalid prompt/length or "
                "reclaimed target page")
        return n

    def _check_prompt(self, prompt_id: int) -> None:
        if not (0 <= prompt_id < self.max_seqs):
            raise ValueError(f"invalid prompt id {prompt_id}")

    def request_block(self, prompt_id: int) -> Tuple[Optional[int], List[int]]:
        self._check_prompt(prompt_id)
        ev = ctypes.c_int32()
        idx = self._lib.bm_request_block(self._h, prompt_id, ctypes.byref(ev))
        evicted = [ev.value] if ev.value != -1 else []
        return (None if idx == -1 else idx), evicted

    def append_tokens(self, prompt_id: int, n: int
                      ) -> Tuple[List[Segment], List[int]]:
        self._check_prompt(prompt_id)
        if n <= 0:
            # same contract as the Python model: a zero append would be
            # indistinguishable from the preemption signal ([], evicted)
            raise ValueError(f"append_tokens needs n >= 1, got {n} "
                             "(an empty append would read as preemption)")
        cap = n // self.page_size + 2
        pages = (ctypes.c_int32 * cap)()
        offsets = (ctypes.c_int32 * cap)()
        counts = (ctypes.c_int32 * cap)()
        evicted = (ctypes.c_int32 * cap)()
        nev = ctypes.c_int32()
        nsegs = self._lib.bm_append_tokens(self._h, prompt_id, n, pages,
                                           offsets, counts, cap, evicted,
                                           ctypes.byref(nev))
        ev_list = list(evicted[: nev.value])
        if nsegs < 0:
            return [], ev_list
        segs = [Segment(pages[i], offsets[i], counts[i]) for i in range(nsegs)]
        return segs, ev_list


class NativePrefixCachingBlockManager(NativeBlockManager):
    """Same API as kv.manager.PrefixCachingBlockManager, backed by the
    C++ PrefixManager (csrc/). All inherited bm_* calls dispatch
    virtually onto the prefix state machine."""

    def __init__(self, num_pages: int = 100, page_size: int = 32,
                 max_seqs: int = 100):
        self._lib = _load_lib()
        self.num_pages = num_pages
        self.page_size = page_size
        self.max_seqs = max_seqs
        self._h = self._lib.pm_create(num_pages, page_size, max_seqs)

    def match_prefix(self, tokens) -> List[int]:
        cap = max(1, len(tokens) // self.page_size)
        out = (ctypes.c_int32 * cap)()
        n = self._lib.pm_match_prefix(self._h, _int_array(tokens),
                                      len(tokens), out, cap)
        assert n >= 0
        return list(out[:n])

    def adopt(self, prompt_id: int, page_ids: List[int]) -> None:
        rc = self._lib.pm_adopt(self._h, prompt_id,
                                _int_array(page_ids), len(page_ids))
        if rc != 0:
            raise ValueError(
                f"adopt({prompt_id}, {page_ids}): invalid prompt, "
                "non-empty table, or non-cached page")

    def register_prompt(self, prompt_id: int, tokens) -> int:
        n = self._lib.pm_register_prompt(self._h, prompt_id,
                                         _int_array(tokens), len(tokens))
        if n < 0:
            raise ValueError(f"invalid prompt id {prompt_id}")
        return n

    def num_cached(self) -> int:
        return self._lib.pm_num_cached(self._h)

    def holders(self, page: int) -> List[int]:
        out = (ctypes.c_int32 * self.max_seqs)()
        n = self._lib.pm_holders(self._h, page, out, self.max_seqs)
        assert n >= 0
        return list(out[:n])

    def release_below(self, prompt_id: int, start_pos: int) -> int:
        raise RuntimeError("prefix caching is incompatible with "
                           "sliding-window page reclamation (the engine "
                           "forbids combining them)")

    def truncate_to(self, prompt_id: int, new_len: int) -> int:
        n = self._lib.bm_truncate_to(self._h, prompt_id, new_len)
        if n < 0:
            raise ValueError(
                f"truncate_to({new_len}): invalid prompt/length or "
                "shared/cached target page")
        return n


def make_block_manager(num_pages: int = 100, page_size: int = 32,
                       max_seqs: int = 100, native: Optional[bool] = None,
                       prefix: bool = False):
    """Factory: native C++ manager if buildable (or native=True), else the
    pure-Python reference model (native=False forces it). prefix=True
    selects the prefix-caching state machine (PageConfig.prefix_cache)."""
    from llmc_paged_tpu.kv.manager import PrefixCachingBlockManager
    py_cls = PrefixCachingBlockManager if prefix else BlockManager
    nat_cls = NativePrefixCachingBlockManager if prefix \
        else NativeBlockManager
    if native is False:
        return py_cls(num_pages, page_size, max_seqs)
    try:
        return nat_cls(num_pages, page_size, max_seqs)
    except ImportError:
        if native:
            raise
        return py_cls(num_pages, page_size, max_seqs)
