// Native block manager for the paged-KV runtime.
//
// Same observable state machine as the host-Python BlockManager
// (llmc_paged_tpu/kv/manager.py) and the reference allocator
// (block_manager.c): first-free allocation, whole-prompt LRU eviction on
// exhaustion, lru_counter = ++epoch on alloc and on append-touch. Unlike
// the reference it owns no float buffers — page data lives in the TPU
// device pool; this is pure metadata, exported over a C ABI for ctypes.
//
// Build: make -C csrc   →  csrc/libpagedrt.so

#include <cstdint>
#include <vector>

namespace {

struct PageMeta {
    int32_t prompt_id = -1;
    int32_t filled = 0;
    int64_t lru_counter = 0;
};

struct Manager {
    int32_t num_pages;
    int32_t page_size;
    int32_t max_seqs;
    int64_t lru_epoch = 0;
    std::vector<PageMeta> pages;
    std::vector<std::vector<int32_t>> tables;  // prompt -> ordered page ids

    Manager(int32_t np, int32_t ps, int32_t ms)
        : num_pages(np), page_size(ps), max_seqs(ms), pages(np), tables(ms) {}

    int32_t find_free() const {
        for (int32_t i = 0; i < num_pages; i++)
            if (pages[i].prompt_id == -1) return i;
        return -1;
    }

    int32_t find_lru() const {
        int32_t victim = -1;
        int64_t bound = lru_epoch;
        for (int32_t i = 0; i < num_pages; i++) {
            if (pages[i].prompt_id != -1 && pages[i].lru_counter < bound) {
                bound = pages[i].lru_counter;
                victim = i;
            }
        }
        return victim;
    }

    void free_prompt(int32_t prompt) {
        if (prompt < 0 || prompt >= max_seqs) return;
        for (int32_t pid : tables[prompt])
            if (pid >= 0) pages[pid] = PageMeta{};
        tables[prompt].clear();
    }

    // Sliding-window reclamation: free pages wholly below start_pos,
    // leaving -1 tombstones so later positions keep their table index
    // (mirrors BlockManager.release_below).
    int32_t release_below(int32_t prompt, int32_t start_pos) {
        if (prompt < 0 || prompt >= max_seqs) return -1;
        auto& t = tables[prompt];
        int32_t limit = start_pos / page_size;
        if (limit > static_cast<int32_t>(t.size()))
            limit = static_cast<int32_t>(t.size());
        int32_t freed = 0;
        for (int32_t j = 0; j < limit; j++) {
            if (t[j] >= 0) {
                pages[t[j]] = PageMeta{};
                t[j] = -1;
                freed++;
            }
        }
        return freed;
    }

    // Roll the write pointer back to new_len tokens, freeing trailing
    // pages that become empty (mirrors BlockManager.truncate_to; used by
    // speculative decode to release over-reserved pages). Returns pages
    // freed, or -1 on invalid prompt/new_len or when new_len lands in a
    // tombstoned (window-reclaimed) page.
    int32_t truncate_to(int32_t prompt, int32_t new_len) {
        if (prompt < 0 || prompt >= max_seqs) return -1;
        auto& t = tables[prompt];
        int32_t cur = 0;
        for (int32_t pid : t)
            cur += pid < 0 ? page_size : pages[pid].filled;
        if (new_len < 0 || new_len > cur) return -1;
        if (new_len == cur) return 0;
        int32_t keep = (new_len + page_size - 1) / page_size;
        if (new_len > 0 && t[keep - 1] < 0) return -1;
        int32_t freed = 0;
        while (static_cast<int32_t>(t.size()) > keep) {
            if (t.back() >= 0) {
                pages[t.back()] = PageMeta{};
                freed++;
            }
            t.pop_back();
        }
        if (new_len > 0)
            pages[t[keep - 1]].filled = new_len - (keep - 1) * page_size;
        return freed;
    }

    // returns page id or -1; *evicted set to the paged-out prompt or -1
    int32_t request_block(int32_t prompt, int32_t* evicted) {
        *evicted = -1;
        if (prompt < 0 || prompt >= max_seqs) return -1;
        int32_t idx = find_free();
        if (idx == -1) {
            int32_t victim = find_lru();
            if (victim != -1) {
                *evicted = pages[victim].prompt_id;
                free_prompt(*evicted);
            }
            idx = find_free();
            if (idx == -1) return -1;
        }
        lru_epoch++;
        pages[idx] = PageMeta{prompt, 0, lru_epoch};
        tables[prompt].push_back(idx);
        return idx;
    }

    int32_t current_block(int32_t prompt) const {
        if (prompt < 0 || prompt >= max_seqs || tables[prompt].empty())
            return -1;
        return tables[prompt].back();
    }
};

}  // namespace

extern "C" {

void* bm_create(int32_t num_pages, int32_t page_size, int32_t max_seqs) {
    return new Manager(num_pages, page_size, max_seqs);
}

void bm_destroy(void* m) { delete static_cast<Manager*>(m); }

int32_t bm_request_block(void* m, int32_t prompt, int32_t* evicted) {
    return static_cast<Manager*>(m)->request_block(prompt, evicted);
}

void bm_free_prompt(void* m, int32_t prompt) {
    static_cast<Manager*>(m)->free_prompt(prompt);
}

int32_t bm_current_block(void* m, int32_t prompt) {
    return static_cast<Manager*>(m)->current_block(prompt);
}

// Reserve n token rows for `prompt`, spanning pages. Fills up to `cap`
// (page, offset, count) segments; evicted prompt ids (≤ cap) into
// `evicted`. Returns segment count, or -1 if the pool was exhausted or the
// requesting prompt evicted itself — the caller must then treat the
// sequence as preempted and bm_free_prompt() it.
int32_t bm_append_tokens(void* m, int32_t prompt, int32_t n,
                         int32_t* seg_pages, int32_t* seg_offsets,
                         int32_t* seg_counts, int32_t cap,
                         int32_t* evicted, int32_t* num_evicted) {
    Manager* mgr = static_cast<Manager*>(m);
    *num_evicted = 0;
    int32_t nsegs = 0;
    int32_t remaining = n;
    while (remaining > 0) {
        int32_t cur = mgr->current_block(prompt);
        if (cur == -1 || mgr->pages[cur].filled >= mgr->page_size) {
            int32_t ev = -1;
            cur = mgr->request_block(prompt, &ev);
            if (ev != -1 && *num_evicted < cap) evicted[(*num_evicted)++] = ev;
            if (cur == -1 || ev == prompt) return -1;
        } else {
            mgr->lru_epoch++;
            mgr->pages[cur].lru_counter = mgr->lru_epoch;
        }
        PageMeta& pg = mgr->pages[cur];
        int32_t take = remaining < mgr->page_size - pg.filled
                           ? remaining
                           : mgr->page_size - pg.filled;
        if (nsegs >= cap) return -1;
        seg_pages[nsegs] = cur;
        seg_offsets[nsegs] = pg.filled;
        seg_counts[nsegs] = take;
        nsegs++;
        pg.filled += take;
        remaining -= take;
    }
    return nsegs;
}

int32_t bm_block_table(void* m, int32_t prompt, int32_t* out, int32_t cap) {
    Manager* mgr = static_cast<Manager*>(m);
    if (prompt < 0 || prompt >= mgr->max_seqs) return -1;
    const auto& t = mgr->tables[prompt];
    int32_t n = static_cast<int32_t>(t.size());
    if (n > cap) return -1;
    for (int32_t i = 0; i < n; i++) out[i] = t[i];
    return n;
}

int32_t bm_seq_len(void* m, int32_t prompt) {
    Manager* mgr = static_cast<Manager*>(m);
    if (prompt < 0 || prompt >= mgr->max_seqs) return -1;
    int32_t total = 0;  // tombstoned pages still count (positions stay absolute)
    for (int32_t pid : mgr->tables[prompt])
        total += pid < 0 ? mgr->page_size : mgr->pages[pid].filled;
    return total;
}

int32_t bm_release_below(void* m, int32_t prompt, int32_t start_pos) {
    return static_cast<Manager*>(m)->release_below(prompt, start_pos);
}

int32_t bm_truncate_to(void* m, int32_t prompt, int32_t new_len) {
    return static_cast<Manager*>(m)->truncate_to(prompt, new_len);
}

int32_t bm_num_free(void* m) {
    Manager* mgr = static_cast<Manager*>(m);
    int32_t n = 0;
    for (const auto& pg : mgr->pages)
        if (pg.prompt_id == -1) n++;
    return n;
}

int64_t bm_lru_epoch(void* m) { return static_cast<Manager*>(m)->lru_epoch; }

int32_t bm_page_meta(void* m, int32_t page, int32_t* prompt_id,
                     int32_t* filled, int64_t* lru) {
    Manager* mgr = static_cast<Manager*>(m);
    if (page < 0 || page >= mgr->num_pages) return -1;
    *prompt_id = mgr->pages[page].prompt_id;
    *filled = mgr->pages[page].filled;
    *lru = mgr->pages[page].lru_counter;
    return 0;
}

}  // extern "C"
