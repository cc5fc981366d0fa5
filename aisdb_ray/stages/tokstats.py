"""Corpus statistics over the token-id payload itself.

The engine's input rows carry the training payload as ``tokens:
list<int32>`` (BASELINE.json input_hint).  These operators read that
column directly — the vocabulary-usage statistics an LLM-data pipeline
runs before training (token unigram/bigram distributions drive vocab
pruning, BPE re-fitting decisions, and corpus-mix diagnostics; the
reference's analogous corpus passes are the per-file track statistics of
/root/reference/aisdb/track_gen.py, restated over token arrays).

Shape: zero-copy ``list_flatten`` + ``list_parent_indices`` per batch (a
bigram never crosses a row boundary), int64-packed bigram codes, per-batch
group-count partials, then ONE hash combine keyed by the code — only
(code, partial-count) rows ever shuffle, never token arrays.  The final
sort+limit runs on the combined code table (bounded by distinct-bigram
count, not corpus size).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_SHIFT = 1 << 32  # token ids are int32 (vocab << 2^32): (a, b) packs losslessly


def _valid_tokens(batch: pa.Table) -> pa.ChunkedArray | pa.Array:
    """The payload contract filter (n_tok > 0, len(tokens) == n_tok, and
    no null ELEMENTS inside the list) — the row validity rule of
    prepare.prepare, applied here because these stats read the raw table
    without the epoch parse.  Null elements matter: list_value_length
    counts them, but a null token id flattens to NaN and casts to
    INT64_MIN — garbage codes polluting every downstream count."""
    ok = pc.and_(
        pc.greater(batch["n_tok"], pa.scalar(0)),
        pc.equal(pc.list_value_length(batch["tokens"]), batch["n_tok"]),
    )
    toks = batch.filter(ok)["tokens"]
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = pc.list_flatten(toks)
    if flat.null_count:
        par = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        bad = np.unique(par[pc.is_null(flat).to_numpy(zero_copy_only=False)])
        keep = np.ones(len(toks), dtype=bool)
        keep[bad] = False
        toks = toks.filter(pa.array(keep))
    return toks


def _valid_rows(batch: pa.Table) -> pa.Table:
    """Row-level payload-contract filter (the _valid_tokens rule, for
    kernels that also need key/doc_id columns): n_tok > 0, len == n_tok,
    and no null ELEMENTS inside the token list — a null id would flatten
    to NaN and cast to INT64_MIN garbage codes."""
    ok = pc.and_(
        pc.greater(batch["n_tok"], pa.scalar(0)),
        pc.equal(pc.list_value_length(batch["tokens"]), batch["n_tok"]),
    )
    b = batch.filter(ok)
    toks = b["tokens"]
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = pc.list_flatten(toks)
    if flat.null_count:
        par = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        bad = np.unique(par[pc.is_null(flat).to_numpy(zero_copy_only=False)])
        keep = np.ones(b.num_rows, dtype=bool)
        keep[bad] = False
        b = b.filter(pa.array(keep))
    return b


def bigram_partial(batch: pa.Table) -> pa.Table:
    """Per-batch (packed bigram code, count) partial."""
    toks = _valid_tokens(batch)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    empty = pa.table(
        {"code": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
    )
    if len(toks) == 0:
        return empty
    flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    if len(flat) < 2:
        return empty
    par = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    same = par[:-1] == par[1:]
    code = flat[:-1] * _SHIFT + flat[1:]
    code = code[same]
    if len(code) == 0:
        return empty
    uniq, cnt = np.unique(code, return_counts=True)
    return pa.table({"code": uniq, "n": cnt.astype(np.int64)})


def _combine_codes(b: pa.Table) -> pa.Table:
    g = b.group_by(["code"], use_threads=False).aggregate([("n", "sum")])
    return g.rename_columns(["code", "n"])


def bigram_topk(ds, k: int = 100):
    """Top-k adjacent token-id bigrams corpus-wide, ties broken by
    (tok_a asc, tok_b asc) — i.e. packed code ascending.

    The global combine is a code-keyed hash co-shuffle with ONE vectorized
    task per partition (never ``groupby(code).map_groups`` — per-group
    invocation over millions of distinct codes is the per-tiny-group
    anti-pattern, see stages/_dist.py).  Each partition holds every count
    of its codes, so a per-partition top-k prefilter is exact; the final
    sort+limit sees only num_parts × k rows."""
    from aisdb_ray.stages._dist import co_shuffle

    partials = ds.map_batches(bigram_partial, batch_format="pyarrow")
    local = partials.map_batches(
        _combine_codes, batch_format="pyarrow", batch_size=None
    )

    def per_part(part: pa.Table) -> pa.Table:
        g = _combine_codes(part)
        order = pc.sort_indices(
            g, sort_keys=[("n", "descending"), ("code", "ascending")]
        )
        return g.take(order.slice(0, k))

    merged = co_shuffle(local, ["code"], per_part)
    top = merged.sort(["n", "code"], descending=[True, False]).limit(k)

    def unpack(b: pa.Table) -> pa.Table:
        code = b["code"]
        return pa.table(
            {
                "tok_a": pc.divide(code, pa.scalar(_SHIFT, pa.int64())),
                "tok_b": pc.subtract(
                    code,
                    pc.multiply(
                        pc.divide(code, pa.scalar(_SHIFT, pa.int64())),
                        pa.scalar(_SHIFT, pa.int64()),
                    ),
                ),
                "n": b["n"],
            }
        )

    return top.map_batches(unpack, batch_format="pyarrow")


def unigram_partial(batch: pa.Table) -> pa.Table:
    """Per-batch (token_id, count) partial."""
    toks = _valid_tokens(batch)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    if len(toks) == 0:
        return pa.table(
            {"token_id": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
        )
    flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    uniq, cnt = np.unique(flat, return_counts=True)
    return pa.table({"token_id": uniq, "n": cnt.astype(np.int64)})


def unigram_hist(ds):
    """Exact corpus token-id histogram (one row per distinct token id —
    vocabulary-bounded, so the combined result is small by construction)."""

    from aisdb_ray.stages._dist import co_shuffle

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["token_id"], use_threads=False).aggregate([("n", "sum")])
        return g.rename_columns(["token_id", "n"])

    partials = ds.map_batches(unigram_partial, batch_format="pyarrow")
    local = partials.map_batches(combine, batch_format="pyarrow", batch_size=None)
    return co_shuffle(local, ["token_id"], combine)


def simpson_partial(batch: pa.Table, key: str = "source") -> pa.Table:
    """Per-batch (key, token_id, count) partial over the token payload."""
    b = _valid_rows(batch)  # incl. null-ELEMENT rows, like every sibling
    toks = b["tokens"]
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    empty = pa.table(
        {
            key: pa.array([], pa.string()),
            "token_id": pa.array([], pa.int64()),
            "c": pa.array([], pa.int64()),
        }
    )
    if len(toks) == 0:
        return empty
    flat = pc.cast(pc.list_flatten(toks), pa.int64())
    par = pc.list_parent_indices(toks)
    keys = b[key]
    if isinstance(keys, pa.ChunkedArray):
        keys = keys.combine_chunks()
    g = (
        pa.table({key: keys.take(par), "token_id": flat})
        .group_by([key, "token_id"], use_threads=False)
        .aggregate([([], "count_all")])
    )
    return g.rename_columns([key, "token_id", "c"])


def simpson_diversity(ds, key: str = "source"):
    """Per-key token-diversity evidence: total token count and the Simpson
    collision sum Σc² over per-(key, token) counts — the inverse-Simpson
    diversity ``n²/Σc²`` is left to the consumer so the result hashes as
    exact integers (the corpus-mix diagnostic: low diversity flags
    template/boilerplate-heavy sources before they skew training).

    Shape: vectorized per-batch (key, token, count) partials, ONE hash
    co-shuffle on (key, token) — a token's count becomes global inside its
    partition, so Σc² partials per (key, partition) are exact — then a
    tiny per-key combine."""
    from aisdb_ray.stages._dist import co_shuffle, funnel_combine

    partials = ds.map_batches(
        lambda b: simpson_partial(b, key), batch_format="pyarrow"
    )

    def per_part(part: pa.Table) -> pa.Table:
        g = part.group_by([key, "token_id"], use_threads=False).aggregate(
            [("c", "sum")]
        )
        cc = pc.multiply_checked(g["c_sum"], g["c_sum"])  # raise, not wrap
        t = pa.table({key: g[key], "n": g["c_sum"], "c2": cc})
        out = t.group_by([key], use_threads=False).aggregate(
            [("n", "sum"), ("c2", "sum")]
        )
        return out.rename_columns([key, "n_tokens", "sum_c2"])

    parts = co_shuffle(partials, [key, "token_id"], per_part)

    def merge(b: pa.Table) -> pa.Table:
        g = b.group_by([key], use_threads=False).aggregate(
            [("n_tokens", "sum"), ("sum_c2", "sum")]
        )
        return g.rename_columns([key, "n_tokens", "sum_c2"])

    return funnel_combine(parts, merge, key_col=key, hash_combine=True)


def zipf_evidence(ds):
    """Zipf-law fit evidence over the corpus unigram distribution: rank
    tokens by (count desc, id asc) and regress bit-quantized log-log
    (x = bit_length(rank), y = bit_length(count)).  Returns ONE row of
    integer sufficient statistics — (n_terms, sum_x, sum_y, sxy_n =
    n·Σxy − Σx·Σy, sxx_n = n·Σx² − (Σx)²) — so the slope ŷ = sxy_n/sxx_n
    (≈ −Zipf exponent in bits) is the consumer's one division and the
    result hashes exactly.

    The global rank needs a total order over the vocabulary, which is
    bounded by construction (one row per distinct token id, NOT corpus
    size): the histogram collapses to a single block — the documented
    small-side funnel, same contract as rank.py's top-k finish."""
    from aisdb_ray.stages.contamination import _bit_length

    hist = unigram_hist(ds)

    def fit(b: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "n_terms": pa.array([], pa.int64()),
                "sum_x": pa.array([], pa.int64()),
                "sum_y": pa.array([], pa.int64()),
                "sxy_n": pa.array([], pa.int64()),
                "sxx_n": pa.array([], pa.int64()),
            }
        )
        if b.num_rows == 0:
            return empty
        n = b["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        tid = b["token_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((tid, -n))
        freq = n[order]
        rank = np.arange(1, len(freq) + 1, dtype=np.int64)
        x = _bit_length(rank)
        y = _bit_length(freq)
        m = np.int64(len(x))
        sx, sy = x.sum(), y.sum()
        return pa.table(
            {
                "n_terms": pa.array([int(m)], pa.int64()),
                "sum_x": pa.array([int(sx)], pa.int64()),
                "sum_y": pa.array([int(sy)], pa.int64()),
                "sxy_n": pa.array([int(m * (x * y).sum() - sx * sy)], pa.int64()),
                "sxx_n": pa.array([int(m * (x * x).sum() - sx * sx)], pa.int64()),
            }
        )

    return hist.repartition(1).map_batches(
        fit, batch_format="pyarrow", batch_size=None
    )


def vocab_coverage(ds, ps=(90, 99)):
    """Vocabulary-coverage curve points: the smallest number of token ids
    (most frequent first, ties -> smaller id) whose counts cover >= p% of
    all token occurrences — the statistic behind vocab-truncation and
    embedding-table sizing decisions.

    Built on :func:`unigram_hist` (vocabulary-bounded), so the final
    sort+cumsum runs in ONE task over vocab-sized rows regardless of
    corpus size.  The rank rule is the engine's shared discrete-quantile
    integer form: smallest k with cum >= (p * total + 99) // 100 — exact
    on both sides, no float thresholds.  One output row:
    (total_tokens, n_distinct, k<p>...)."""
    hist = unigram_hist(ds)

    def finalize(b: pa.Table) -> pa.Table:
        tid = b["token_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = b["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((tid, -n))
        cum = np.cumsum(n[order])
        total = int(cum[-1]) if len(cum) else 0
        row = {
            "total_tokens": pa.array([total], pa.int64()),
            "n_distinct": pa.array([len(n)], pa.int64()),
        }
        for p in ps:
            need = (p * total + 99) // 100
            k = int(np.searchsorted(cum, need)) + 1 if total else 0
            row[f"k{p}"] = pa.array([k], pa.int64())
        return pa.table(row)

    return hist.repartition(1).map_batches(
        finalize, batch_format="pyarrow", batch_size=None
    )


def pmi_topk(ds, k: int = 50, min_count: int = 5):
    """Top-k PMI collocations over adjacent token-id pairs.

    PMI(a,b) = log(c_ab·T / (c_a·c_b)) is monotone in the exact rational
    r = c_ab·T / (c_a·c_b), so ranking never takes a log: both products
    stay exact int64 and r is ONE IEEE division, bit-identical in SQL.
    T is the total adjacent-pair count  Σ(n_tok − 1)  over valid rows
    (length-1 rows contribute 0, matching the extraction).  The unigram
    table is vocabulary-bounded, so it broadcasts once via ``ray.put``;
    bigram counts >= ``min_count`` are ranked per partition and only
    partitions × k candidate rows reach the final merge.
    """
    import ray

    from aisdb_ray.stages._dist import co_shuffle

    uni = unigram_hist(ds).take_all()          # vocabulary-bounded
    c_of = {int(r["token_id"]): int(r["n"]) for r in uni}
    uni_ref = ray.put(c_of)

    partials = ds.map_batches(bigram_partial, batch_format="pyarrow")
    local = partials.map_batches(
        _combine_codes, batch_format="pyarrow", batch_size=None
    ).materialize()  # consumed twice: T and the ranking shuffle
    # T = Σ(n_tok − 1) over valid rows == the total bigram-pair count,
    # which the partials already hold — no third full-corpus scan
    t_total = int(local.sum("n") or 0)

    def score(g: pa.Table) -> pa.Table:
        code = g["code"].to_numpy(zero_copy_only=False)
        n = g["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = n >= min_count
        code, n = code[keep], n[keep]
        cm = ray.get(uni_ref)
        ta = (code // _SHIFT).astype(np.int64)
        tb = (code % _SHIFT).astype(np.int64)
        ca = np.array([cm[int(t)] for t in ta], np.int64)
        cb = np.array([cm[int(t)] for t in tb], np.int64)
        # the "exact int64" ranking claim needs an actual guard: numpy
        # int64 multiply wraps silently, and corpus-scale T (Σ pairs) or
        # two frequent unigrams can cross 2^63 — refuse, don't mis-rank
        if len(n) and (
            int(n.max()) * t_total >= (1 << 63)
            or int(ca.max()) * int(cb.max()) >= (1 << 63)
        ):
            raise OverflowError(
                "pmi_topk: count products exceed int64 — subsample or "
                "shard the corpus before ranking"
            )
        r = (n * t_total).astype(np.float64) / (ca * cb).astype(np.float64)
        return pa.table({
            "tok_a": pa.array(ta), "tok_b": pa.array(tb),
            "n": pa.array(n), "c_a": pa.array(ca), "c_b": pa.array(cb),
            "pmi_ratio": pa.array(r),
        })

    def per_part(part: pa.Table) -> pa.Table:
        g = score(_combine_codes(part))
        order = pc.sort_indices(
            g, sort_keys=[("pmi_ratio", "descending"), ("tok_a", "ascending"),
                          ("tok_b", "ascending")]
        )
        return g.take(order.slice(0, k))

    merged = co_shuffle(local, ["code"], per_part)
    return merged.sort(
        ["pmi_ratio", "tok_a", "tok_b"], descending=[True, False, False]
    ).limit(k)


def rle_runs(ds):
    """Per-row token run-length evidence: (doc_id, n_tok, n_runs,
    rle_ratio) with n_runs the count of maximal adjacent equal-token runs
    — the degenerate-repetition signal (rle_ratio -> 0 means the sequence
    is dominated by repeated tokens; a quality gate drops it before
    training).  Map-only and zero-shuffle: a row's tokens never split
    across batches, and the kernel is one flatten + one shifted compare +
    one reduceat per batch.  rle_ratio = n_runs / n_tok, one IEEE
    division on exact ints."""

    def per_batch(b: pa.Table) -> pa.Table:
        b = _valid_rows(b)  # null token ELEMENTS would inflate n_runs
        empty = pa.table({
            "doc_id": pa.array([], pa.string()),
            "n_tok": pa.array([], pa.int64()),
            "n_runs": pa.array([], pa.int64()),
            "rle_ratio": pa.array([], pa.float64()),
        })
        if b.num_rows == 0:
            return empty
        toks = b["tokens"]
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
        par = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        n = b["n_tok"].to_numpy(zero_copy_only=False).astype(np.int64)
        # a run boundary: same row, value differs from predecessor
        brk = np.r_[False, (par[1:] == par[:-1]) & (flat[1:] != flat[:-1])]
        starts = np.r_[0, np.cumsum(n)[:-1]]
        runs = 1 + np.add.reduceat(brk.astype(np.int64), starts)
        # reduceat with a repeated start (n_i == 0 impossible: n_tok > 0)
        return pa.table({
            "doc_id": b["doc_id"],
            "n_tok": pa.array(n),
            "n_runs": pa.array(runs),
            "rle_ratio": pa.array(runs.astype(np.float64) / n.astype(np.float64)),
        })

    return ds.map_batches(per_batch, batch_format="pyarrow")


def vocab_growth(ds_prepared_tokens, day_seconds: int = 86400):
    """Vocabulary growth curve (Heaps-law evidence): for each day, how
    many token ids appear in the corpus for the FIRST time that day —
    the statistic behind "has the crawl stopped contributing new
    vocabulary" re-fit decisions.

    Input rows must carry ``time`` (epoch s) and ``tokens``.  Shape:
    per-batch (token, min-day) partials off zero-copy list_flatten, ONE
    token-keyed hash-min combine (vocab-bounded rows, never token
    arrays), then a day-keyed count — the same algebraic-min skeleton as
    the HLL registers."""
    from aisdb_ray.stages._dist import funnel_combine

    def partial(batch: pa.Table) -> pa.Table:
        toks = batch["tokens"]
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        empty = pa.table({
            "tokid": pa.array([], pa.int64()),
            "day": pa.array([], pa.int64()),
        })
        if batch.num_rows == 0:
            return empty
        flat = pc.list_flatten(toks).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        if len(flat) == 0:
            return empty
        par = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        day = (
            batch["time"].to_numpy(zero_copy_only=False).astype(np.int64)
            // day_seconds
        )[par]
        # per-batch min day per token: lexsort + first-of-run
        order = np.lexsort((day, flat))
        f, d = flat[order], day[order]
        first = np.r_[True, f[1:] != f[:-1]]
        return pa.table({
            "tokid": pa.array(f[first], pa.int64()),
            "day": pa.array(d[first], pa.int64()),
        })

    def min_merge(b: pa.Table) -> pa.Table:
        g = b.group_by(["tokid"], use_threads=False).aggregate(
            [("day", "min")]
        )
        return g.rename_columns(["tokid", "day"])

    partials = ds_prepared_tokens.map_batches(partial, batch_format="pyarrow")
    return funnel_combine(
        partials, min_merge, key_col="tokid", hash_combine=True,
    ).map_batches(
        lambda b: pa.table({"day": b["day"]}), batch_format="pyarrow"
    ).groupby("day").count().map_batches(
        lambda b: pa.table({
            "day": b["day"], "n_new": pc.cast(b["count()"], pa.int64())
        }),
        batch_format="pyarrow",
    )


def skipgram_partial(batch: pa.Table, window: int = 3) -> pa.Table:
    """Per-batch (packed ordered skip-gram code, count) partial: pairs
    (tokens[i], tokens[j]) with 1 <= j - i <= window inside one
    sequence — the word2vec context-window co-occurrence counts, kept
    ORDERED (left token first) so the SQL restatement is a plain
    subscript self-join."""
    toks = _valid_tokens(batch)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    empty = pa.table(
        {"code": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
    )
    if len(toks) == 0:
        return empty
    flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    if len(flat) < 2:
        return empty
    par = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    codes = []
    for off in range(1, window + 1):
        if len(flat) <= off:
            break
        same = par[:-off] == par[off:]
        codes.append(flat[:-off][same] * _SHIFT + flat[off:][same])
    if not codes:
        return empty
    code = np.concatenate(codes)
    if len(code) == 0:
        return empty
    uniq, cnt = np.unique(code, return_counts=True)
    return pa.table({"code": uniq, "n": cnt.astype(np.int64)})


def skipgram_topk(ds, k: int = 100, window: int = 3):
    """Top-k context-window (±window, ordered) token-id co-occurrences —
    the word2vec/PMI-context statistic; same code-keyed hash-combine +
    per-partition exact top-k prefilter shape as :func:`bigram_topk`."""
    from aisdb_ray.stages._dist import co_shuffle

    partials = ds.map_batches(
        lambda b: skipgram_partial(b, window), batch_format="pyarrow"
    )
    local = partials.map_batches(
        _combine_codes, batch_format="pyarrow", batch_size=None
    )

    def per_part(part: pa.Table) -> pa.Table:
        g = _combine_codes(part)
        order = pc.sort_indices(
            g, sort_keys=[("n", "descending"), ("code", "ascending")]
        )
        return g.take(order.slice(0, k))

    merged = co_shuffle(local, ["code"], per_part)
    top = merged.sort(["n", "code"], descending=[True, False]).limit(k)

    def unpack(b: pa.Table) -> pa.Table:
        code = b["code"]
        a = pc.divide(code, pa.scalar(_SHIFT, pa.int64()))
        return pa.table({
            "tok_a": a,
            "tok_b": pc.subtract(
                code, pc.multiply(a, pa.scalar(_SHIFT, pa.int64()))
            ),
            "n": b["n"],
        })

    return top.map_batches(unpack, batch_format="pyarrow")


def kn_continuation(ds):
    """Kneser–Ney continuation counts: for each token ``w``, the number of
    DISTINCT tokens that precede it anywhere in the corpus — N1+(·w), the
    numerator of the KN lower-order distribution (Kneser & Ney 1995,
    public).  The statistic that separates "frequent but predictable"
    tokens (high count, few contexts) from genuinely productive ones.

    Shape: per-batch DISTINCT packed bigram codes (np.unique — dedup
    before anything moves), ONE hash co-shuffle keyed by the SECOND token
    so each partition owns every context of its tokens, per-partition
    global dedup + count.  Only (code, cur) distinct-pair rows shuffle,
    never token arrays."""
    from aisdb_ray.stages._dist import co_shuffle

    def distinct_pairs(batch: pa.Table) -> pa.Table:
        toks = _valid_tokens(batch)
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        empty = pa.table({"code": pa.array([], pa.int64()),
                          "cur": pa.array([], pa.int64())})
        if len(toks) == 0:
            return empty
        flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False).astype(np.int64)
        if len(flat) < 2:
            return empty
        par = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        same = par[:-1] == par[1:]
        code = np.unique((flat[:-1] * _SHIFT + flat[1:])[same])
        return pa.table({"code": code, "cur": code % _SHIFT})

    def per_part(part: pa.Table) -> pa.Table:
        code = np.unique(part["code"].to_numpy(zero_copy_only=False))
        cur, n = np.unique(code % _SHIFT, return_counts=True)
        return pa.table({"token": cur, "n_prev": n.astype(np.int64)})

    partials = ds.map_batches(distinct_pairs, batch_format="pyarrow")
    return co_shuffle(partials, ["cur"], per_part)


def lm_score(ds, scale: int = 1_000_000):
    """Integer-exact bigram language-model fluency score per sequence —
    the LM-likelihood quality signal (score training docs by how
    predictable their token stream is under corpus statistics) WITHOUT
    the cross-platform-log hazard: per bigram the scaled conditional
    frequency ``(C(prev,cur) · scale) // C(prev·)``, summed per doc.
    High = fluent/common continuations, low = atypical streams (or
    boilerplate already deduped away).  Everything is int64; the SQL
    oracle reproduces it with the same floor divisions.

    Shape: ONE corpus pass emits per-(doc, bigram) occurrence counts;
    ONE hash co-shuffle keyed by the LEFT token co-locates every
    occurrence of a prev — and since the corpus counts are themselves
    sums of those occurrence counts, C(code) and C(prev·) are derived
    LOCALLY inside each partition (no second scan, no count-table
    broadcast or union routing); a doc-keyed co-shuffle then sums the
    per-occurrence scores."""
    from aisdb_ray.stages._dist import co_shuffle

    def occ_partial(batch: pa.Table) -> pa.Table:
        """(prev, code, doc_id, k) bigram occurrence counts per doc."""
        b2 = _valid_rows(batch)  # null elements -> INT64_MIN codes
        toks = b2["tokens"]
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        empty = pa.table({"prev": pa.array([], pa.int64()),
                          "code": pa.array([], pa.int64()),
                          "doc_id": pa.array([], pa.string()),
                          "k": pa.array([], pa.int64())})
        if len(toks) == 0:
            return empty
        flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False).astype(np.int64)
        if len(flat) < 2:
            return empty
        par = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        same = par[:-1] == par[1:]
        code = (flat[:-1] * _SHIFT + flat[1:])[same]
        doc = par[:-1][same]
        ids = np.asarray(b2["doc_id"].to_pylist(), dtype=object)
        order = np.lexsort((code, doc))
        ds_, cs_ = doc[order], code[order]
        head = np.r_[True, (ds_[1:] != ds_[:-1]) | (cs_[1:] != cs_[:-1])]
        starts = np.flatnonzero(head)
        cnt = np.diff(np.r_[starts, len(cs_)])
        return pa.table({
            "prev": pa.array(cs_[starts] // _SHIFT, pa.int64()),
            "code": pa.array(cs_[starts], pa.int64()),
            "doc_id": pa.array(ids[ds_[starts]].tolist(), pa.string()),
            "k": pa.array(cnt.astype(np.int64)),
        })

    occ = ds.map_batches(occ_partial, batch_format="pyarrow")

    def score_part(part: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], pa.string()),
                          "score": pa.array([], pa.int64()),
                          "nb": pa.array([], pa.int64())})
        if part.num_rows == 0:
            return empty
        code = part["code"].to_numpy(zero_copy_only=False)
        prev = part["prev"].to_numpy(zero_copy_only=False)
        k = part["k"].to_numpy(zero_copy_only=False)
        # corpus counts ARE the partition-local sums of k: the partition
        # holds every occurrence of its prevs by construction
        ucode, inv_c = np.unique(code, return_inverse=True)
        cn_tbl = np.zeros(len(ucode), dtype=np.int64)
        np.add.at(cn_tbl, inv_c, k)
        uprev, inv_p = np.unique(prev, return_inverse=True)
        pn_tbl = np.zeros(len(uprev), dtype=np.int64)
        np.add.at(pn_tbl, inv_p, k)
        # the pmi_topk guard policy: numpy int64 multiply wraps silently,
        # so corpus-scale bigram counts x scale must refuse, not mis-rank
        if len(cn_tbl) and int(cn_tbl.max()) > (1 << 62) // scale:
            raise OverflowError(
                "lm_score: bigram count x scale exceeds int64 — lower "
                "scale or shard the corpus")
        per = (cn_tbl[inv_c] * scale) // pn_tbl[inv_p] * k
        t = pa.table({"doc_id": part["doc_id"], "score": pa.array(per),
                      "nb": pa.array(k)})
        g = t.group_by(["doc_id"], use_threads=False).aggregate(
            [("score", "sum"), ("nb", "sum")])
        return g.rename_columns(["doc_id", "score", "nb"])

    scored = co_shuffle(occ, ["prev"], score_part)

    def doc_part(part: pa.Table) -> pa.Table:
        g = part.group_by(["doc_id"], use_threads=False).aggregate(
            [("score", "sum"), ("nb", "sum")])
        return g.rename_columns(["doc_id", "lm_score", "n_bigrams"])

    return co_shuffle(scored, ["doc_id"], doc_part)
