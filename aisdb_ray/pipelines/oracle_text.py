"""Generated SQL oracles for the sketch/probabilistic text + embedding ops.

These pipelines (MinHash+LSH, SimHash, rolling-hash fingerprints, random-
hyperplane embedding LSH) look "non-SQL-expressible" only because their
constants live in engine code.  Every constant is *parameter-derived*
(seeded PRNG coefficients, band layouts), never data-derived — so the
generator embeds them as SQL literals and DuckDB recomputes the ENTIRE
pipeline independently from the raw tables: word split -> md5-low-64 word
hashes -> shingles -> (a*x+b) mod 2^64 mod M61 permutations -> band fold ->
candidate pairs -> exact verification.  The engine's word hash is md5's low
64 bits precisely so both sides can compute the identical value
(functions/text.py:md5_64 <-> DuckDB ``('0x' || substr(md5(w),1,16))::UBIGINT``).

Arithmetic notes mirrored from the engine kernels:
- numpy uint64 ops wrap mod 2**64; SQL replicates with HUGEINT ``% 2**64``
  (every intermediate stays < 2**126, inside HUGEINT range).
- MinHash permutation: ``((a*x + b) mod 2**64) mod M61`` exactly as the
  uint64 numpy expression evaluates it (functions/text.py:MinHasher).
- ``j >= p/q`` float compare is replaced by the exact integer form
  ``q*n_inter >= p*n_union`` (equivalent for any n_union < 2**50).
- int64 reinterpretation of uint64 outputs: ``v - 2**64`` when v >= 2**63.

The IVF oracle is intentionally absent: its centroids are fit on DATA
(k-means over a corpus sample), so no static SQL can restate them — that
query stays a rows-only check with recall pinned by pytest.
"""

from __future__ import annotations

P64 = 1 << 64
M61 = (1 << 61) - 1
K = 1_000_003  # polynomial-fold multiplier shared with functions/text.py


def _mulmod64(a: str, b: str) -> str:
    """(a*b) mod 2**64 for a,b < 2**64 via a 32-bit split of b — the direct
    128-bit product can overflow HUGEINT (max 2**127-1)."""
    return (
        f"(({a}) * (({b}) % 4294967296) % {P64}"
        f" + ((({a}) * (({b}) // 4294967296)) % 4294967296) * 4294967296) % {P64}"
    )


_WORDS_CTES = """wl AS (
    SELECT doc_id, regexp_extract_all(text, '\\S+') AS ws FROM documents
  ),
  w AS (
    SELECT doc_id, i,
           ('0x' || substr(md5(ws[i]), 1, 16))::UBIGINT::HUGEINT AS h,
           len(ws) AS nw
    FROM wl, LATERAL (SELECT unnest(generate_series(1, len(ws))) AS i) t
  )"""

# distinct shingle-hash set per doc: 3-gram polynomial fold of word hashes;
# <3-word docs hash the space-joined text (functions/text.py:shingle_hashes)
_SHINGLE_CTES = f"""{_WORDS_CTES},
  sh3 AS (
    SELECT a.doc_id,
           (((a.h * {K} % {P64} + b.h) % {P64}) * {K} % {P64} + c.h) % {P64} AS s
    FROM w a
    JOIN w b ON b.doc_id = a.doc_id AND b.i = a.i + 1
    JOIN w c ON c.doc_id = a.doc_id AND c.i = a.i + 2
  ),
  shsmall AS (
    SELECT doc_id,
           ('0x' || substr(md5(array_to_string(ws, ' ')), 1, 16))::UBIGINT::HUGEINT AS s
    FROM wl WHERE len(ws) BETWEEN 1 AND 2
  ),
  shingle AS (
    SELECT DISTINCT doc_id, s
    FROM (SELECT * FROM sh3 UNION ALL SELECT * FROM shsmall)
  )"""


def minhash_pairs_sql(n_bands: int, rows_per_band: int,
                      thr_num: int, thr_den: int) -> str:
    """Full MinHash+LSH near-dup oracle: signatures -> band buckets ->
    candidate pairs -> exact Jaccard over distinct shingle sets, with the
    threshold as the exact integer compare thr_den*inter >= thr_num*union."""
    from aisdb_ray.functions.text import MinHasher

    mh = MinHasher(n_bands * rows_per_band)
    perms = ",".join(
        f"({p},{int(mh.a[p])},{int(mh.b[p])})" for p in range(mh.n)
    )
    fold = "0::HUGEINT"
    for j in range(1, rows_per_band + 1):
        fold = f"(({fold}) * {K} % {P64} + l[{j}]) % {P64}"
    return f"""WITH {_SHINGLE_CTES},
  perm(p, pa, pb) AS (VALUES {perms}),
  sig AS (
    SELECT sh.doc_id, pm.p,
           min(((pm.pa * sh.s + pm.pb) % {P64}) % {M61}) AS v
    FROM shingle sh CROSS JOIN perm pm GROUP BY sh.doc_id, pm.p
  ),
  sig_empty AS (
    -- empty docs: signature pinned at UINT64_MAX (engine: np.full(max))
    SELECT wl.doc_id, pm.p, {P64 - 1}::HUGEINT AS v
    FROM wl CROSS JOIN perm pm WHERE len(wl.ws) = 0
  ),
  sig_all AS (SELECT * FROM sig UNION ALL SELECT * FROM sig_empty),
  band AS (
    SELECT doc_id, p // {rows_per_band} AS band, list(v ORDER BY p) AS l
    FROM sig_all GROUP BY doc_id, p // {rows_per_band}
  ),
  bandkey AS (SELECT doc_id, band, {fold} AS key FROM band),
  cand AS (
    SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
    FROM bandkey x
    JOIN bandkey y ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id
  ),
  cnts AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n
           FROM shingle GROUP BY doc_id),
  inter AS (
    SELECT c.a, c.b, CAST(count(*) AS BIGINT) AS i
    FROM cand c
    JOIN shingle sa ON sa.doc_id = c.a
    JOIN shingle sb ON sb.doc_id = c.b AND sb.s = sa.s
    GROUP BY c.a, c.b
  ),
  verified AS (
    SELECT c.a, c.b,
           COALESCE(i.i, 0) AS n_inter,
           COALESCE(ca.n, 0) + COALESCE(cb.n, 0) - COALESCE(i.i, 0) AS n_union
    FROM cand c
    LEFT JOIN inter i ON i.a = c.a AND i.b = c.b
    LEFT JOIN cnts ca ON ca.doc_id = c.a
    LEFT JOIN cnts cb ON cb.doc_id = c.b
  )
SELECT a, b, n_inter, n_union
FROM verified
WHERE n_inter * {thr_den} >= n_union * {thr_num} OR n_union = 0"""


def simhash_pairs_sql(max_hamming: int = 8) -> str:
    """SimHash oracle: per-bit majority vote over (multiplicity-weighted)
    word hashes, 4x16-bit pigeonhole bands, Hamming verify via
    bit_count(xor()) on the int64 two's-complement signatures."""
    bit_sums = ",\n           ".join(
        f"SUM(CAST((h >> {i}) & 1 AS BIGINT)) AS s{i}" for i in range(64)
    )
    sim_expr = " + ".join(
        f"(CASE WHEN 2 * s{i} > n THEN {1 << i}::HUGEINT ELSE 0::HUGEINT END)"
        for i in range(64)
    )
    return f"""WITH wl AS (
    SELECT doc_id, regexp_extract_all(text, '\\S+') AS ws FROM documents
  ),
  w AS (
    SELECT doc_id, ('0x' || substr(md5(ws[i]), 1, 16))::UBIGINT AS h
    FROM wl, LATERAL (SELECT unnest(generate_series(1, len(ws))) AS i) t
  ),
  bitsum AS (
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n,
           {bit_sums}
    FROM w GROUP BY doc_id
  ),
  sim AS (
    SELECT wl.doc_id, COALESCE({sim_expr}, 0::HUGEINT) AS hs
    FROM wl LEFT JOIN bitsum b ON b.doc_id = wl.doc_id
  ),
  sim64 AS (
    SELECT doc_id, hs,
           CAST(CASE WHEN hs >= {1 << 63}::HUGEINT THEN hs - {P64}::HUGEINT
                     ELSE hs END AS BIGINT) AS h64
    FROM sim
  ),
  bands AS (
    SELECT doc_id, h64, t.band,
           CAST((hs >> (16 * t.band)) & 65535 AS BIGINT) AS chunk
    FROM sim64, LATERAL (SELECT unnest(generate_series(0, 3)) AS band) t
  ),
  cand AS (
    SELECT DISTINCT x.doc_id AS a, y.doc_id AS b, x.h64 AS ha, y.h64 AS hb
    FROM bands x
    JOIN bands y ON x.band = y.band AND x.chunk = y.chunk AND x.doc_id < y.doc_id
  )
SELECT a, b, CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
FROM cand WHERE bit_count(xor(ha, hb)) <= {max_hamming}"""


def textstats_sql(langid_sql: str) -> str:
    """TextStats oracle: quality counts + max word length + language id
    (spliced from the shared langid oracle) + the polynomial rolling-hash
    fingerprint, whose position-wise recurrence
    ``acc_i = acc_{i-1} + h_i * K^i  (mod 2**64)`` runs as a recursive CTE."""
    pw_next = f"(fp.pw * {K}) % {P64}"
    return f"""WITH RECURSIVE {_WORDS_CTES},
  fp AS (
    SELECT doc_id, i, nw, h AS acc, 1::HUGEINT AS pw
    FROM w WHERE i = 1
    UNION ALL
    SELECT w.doc_id, w.i, w.nw,
           (fp.acc + {_mulmod64('w.h', pw_next)}) % {P64} AS acc,
           {pw_next} AS pw
    FROM fp JOIN w ON w.doc_id = fp.doc_id AND w.i = fp.i + 1
  ),
  fpfinal AS (SELECT doc_id, acc FROM fp WHERE i = nw),
  lang AS ({langid_sql})
SELECT d.doc_id,
       CAST(length(d.text) AS BIGINT) AS n_chars,
       CAST(len(wl.ws) AS BIGINT) AS n_words,
       CAST(length(regexp_extract_all(d.text, '[.,;:!?]')) AS BIGINT) AS n_punct,
       CAST(length(regexp_extract_all(d.text, '[A-Za-z]')) AS BIGINT) AS n_alpha,
       CAST(COALESCE(list_max(list_transform(wl.ws, x -> length(x))), 0) AS BIGINT)
         AS max_word_len,
       lang.pred_lang,
       CAST(CASE WHEN f.acc >= {1 << 63}::HUGEINT THEN f.acc - {P64}::HUGEINT
                 ELSE COALESCE(f.acc, 0::HUGEINT) END AS BIGINT) AS fingerprint
FROM documents d
JOIN wl ON wl.doc_id = d.doc_id
JOIN lang ON lang.doc_id = d.doc_id
LEFT JOIN fpfinal f ON f.doc_id = d.doc_id"""


# ------------------------------------------------------- embedding LSH

def _lsh_cte(dim: int = 64, n_bits: int = 8, n_tables: int = 4,
             seed: int = 11) -> str:
    """planes + per-vector bucket CTEs for the seeded random-hyperplane LSH
    (stages/ann.py:LshIndexParams).  The planes are PRNG-derived from the
    seed — data-independent — so they embed as literals; ``dim`` follows
    the testdata embedding schema (list<float>[64] at every sf)."""
    from aisdb_ray.stages.ann import LshIndexParams

    params = LshIndexParams(dim, n_bits, n_tables, seed)
    rows = []
    for t in range(n_tables):
        for i in range(n_bits):
            vec = ",".join(repr(float(x)) for x in params.planes[t, i])
            rows.append(f"({t},{i},[{vec}]::DOUBLE[])")
    values = ",\n    ".join(rows)
    return f"""planes(tbl, bit, p) AS (VALUES {values}),
  vb AS (
    -- sign-bit bucket per (vector, table); normalization drops out of the
    -- sign so the raw inner product suffices
    SELECT v.vec_id, pl.tbl,
           SUM(CASE WHEN list_inner_product(pl.p, v.embedding::DOUBLE[]) > 0
                    THEN (1::BIGINT << pl.bit) ELSE 0 END) AS bucket
    FROM embeddings v CROSS JOIN planes pl
    GROUP BY v.vec_id, pl.tbl
  )"""


def ann_lsh_topk_sql(k: int = 10, n_bits: int = 8,
                     cand_where: str = "") -> str:
    """LSH ANN oracle: the query vector's bucket (+ all Hamming-1 probes)
    per table defines the candidate set; exact cosine ranks candidates.
    ``cand_where`` injects an extra candidate predicate (e.g. a tombstone
    exclusion) BEFORE ranking — the delete-without-rebuild serving rule."""
    return f"""WITH {_lsh_cte(n_bits=n_bits)},
  qb AS (SELECT tbl, bucket FROM vb WHERE vec_id = 0),
  probes AS (
    SELECT tbl, bucket FROM qb
    UNION
    SELECT qb.tbl, xor(qb.bucket, 1::BIGINT << t.i) AS bucket
    FROM qb, LATERAL (SELECT unnest(generate_series(0, {n_bits - 1})) AS i) t
  ),
  cand AS (SELECT DISTINCT vb.vec_id FROM vb JOIN probes USING (tbl, bucket)
          {cand_where})
SELECT CAST(row_number() OVER (
         ORDER BY list_cosine_similarity(e.embedding,
                  (SELECT embedding FROM embeddings WHERE vec_id = 0)) DESC,
                  e.vec_id) AS BIGINT) AS rank,
       e.vec_id
FROM embeddings e JOIN cand USING (vec_id)
ORDER BY rank LIMIT {k}"""


def emb_neardup_lsh_sql(threshold: float = 0.35) -> str:
    """LSH-bucketed near-dup oracle: pairs sharing any (table, bucket),
    exact cosine verify — mirrors dedup_text.embedding_neardup_lsh_pairs."""
    return f"""WITH {_lsh_cte()}
SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
FROM vb x
JOIN vb y ON x.tbl = y.tbl AND x.bucket = y.bucket AND x.vec_id < y.vec_id
JOIN embeddings ea ON ea.vec_id = x.vec_id
JOIN embeddings eb ON eb.vec_id = y.vec_id
WHERE list_cosine_similarity(ea.embedding, eb.embedding) >= {threshold}"""


def ann_ivf_topk_sql(cent, probes, k: int = 10) -> str:
    """IVF ANN oracle.  ``cent`` is the engine's fitted coarse-quantizer
    matrix (a derived parameter constant, embedded as literals exactly like
    the seeded hyperplanes above); ``probes`` the nprobe nearest lists to
    the query vector.  Per-vector list assignment reduces to
    argmax(e . cent) — the engine normalizes e first, but |e| is a
    positive per-vector constant so the argmax is identical — computed
    in DOUBLE via an unnest dot product; candidates = vectors assigned to
    a probed list; exact cosine ranks them (vec_id tie-break)."""
    dim = len(cent[0])
    vals = ",\n    ".join(
        "({}, [{}]::DOUBLE[])".format(i, ", ".join(repr(float(x)) for x in cent[i]))
        for i in range(len(cent))
    )
    return f"""WITH cent(list, v) AS (VALUES
    {vals}),
  dots AS (
    SELECT e.vec_id, c.list,
           (SELECT sum(CAST(e.embedding[u.i] AS DOUBLE) * c.v[u.i])
            FROM (SELECT unnest(generate_series(1, {dim})) AS i) u) AS d
    FROM embeddings e, cent c
  ),
  assign AS (
    SELECT vec_id, list FROM (
      SELECT vec_id, list,
             row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, list) AS rn
      FROM dots) WHERE rn = 1
  ),
  cand AS (SELECT vec_id FROM assign
           WHERE list IN ({", ".join(str(int(p)) for p in probes)}))
SELECT CAST(row_number() OVER (
         ORDER BY list_cosine_similarity(e.embedding,
                  (SELECT embedding FROM embeddings WHERE vec_id = 0)) DESC,
                  e.vec_id) AS BIGINT) AS rank,
       e.vec_id
FROM embeddings e JOIN cand USING (vec_id)
ORDER BY rank LIMIT {k}"""


def _components_cte(n_bands: int, rows_per_band: int,
                    thr_num: int, thr_den: int) -> str:
    """Shared WITH-RECURSIVE prelude closing the MinHash pair oracle
    transitively: ends with a ``comp(node, component)`` CTE that must stay
    token-identical to the engine's min-label fixpoint semantics."""
    pairs = minhash_pairs_sql(n_bands, rows_per_band, thr_num, thr_den)
    return f"""WITH RECURSIVE pairs AS (
    SELECT a, b FROM ({pairs}) q WHERE a <> b
  ),
  edges AS (
    SELECT a AS u, b AS v FROM pairs
    UNION
    SELECT b AS u, a AS v FROM pairs
  ),
  nodes AS (SELECT DISTINCT u AS node FROM edges),
  reach(node, m) AS (
    SELECT node, node FROM nodes
    UNION
    SELECT r.node, e.v FROM reach r JOIN edges e ON e.u = r.m
  ),
  comp AS (SELECT node, min(m) AS component FROM reach GROUP BY node)"""


def dup_components_sql(n_bands: int, rows_per_band: int,
                       thr_num: int, thr_den: int) -> str:
    """Connected components over the MinHash near-dup pair graph: the pair
    oracle embedded as a subquery, closed transitively with a recursive CTE;
    component = min reachable doc_id (the engine's min-label fixpoint)."""
    return (_components_cte(n_bands, rows_per_band, thr_num, thr_den)
            + "\nSELECT node AS doc_id, component FROM comp")


def dedup_survivors_sql(n_bands: int, rows_per_band: int,
                        thr_num: int, thr_den: int) -> str:
    """One canonical document per near-dup cluster: every document except
    the NON-minimum members of each component."""
    return (_components_cte(n_bands, rows_per_band, thr_num, thr_den)
            + """
SELECT d.doc_id FROM documents d
WHERE NOT EXISTS (
  SELECT 1 FROM comp c WHERE c.node = d.doc_id AND c.node <> c.component
)""")


def ann_ivfpq_topk_sql(cent, probes, cb_vals: str, dsub: int,
                       k: int = 10) -> str:
    """IVFADC oracle — the IVF assignment CTE (embedded coarse centroids,
    same argmax-tie rule as ann_ivf_topk_sql) restricted to the probed
    lists, composed with the PQ re-derivation (codes from the embedded
    integer codebooks, query LUT from the vec_id=0 row's fixed-point
    view), ranked by the exact int64 ADC score with vec_id tie-break —
    token-matching stages/ann.ivfpq_topk."""
    dim = len(cent[0])
    vals = ",\n    ".join(
        "({}, [{}]::DOUBLE[])".format(i, ", ".join(repr(float(x)) for x in cent[i]))
        for i in range(len(cent))
    )
    probe_list = ", ".join(str(int(p)) for p in probes)
    return f"""WITH cent(list, v) AS (VALUES
    {vals}),
  dots AS (
    SELECT e.vec_id, c.list,
           (SELECT sum(CAST(e.embedding[u.i] AS DOUBLE) * c.v[u.i])
            FROM (SELECT unnest(generate_series(1, {dim})) AS i) u) AS d
    FROM embeddings e, cent c
  ),
  assign AS (
    SELECT vec_id, list FROM (
      SELECT vec_id, list,
             row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, list) AS rn
      FROM dots) WHERE rn = 1
  ),
  cand AS (SELECT vec_id FROM assign WHERE list IN ({probe_list})),
  e AS (
    SELECT em.vec_id,
           list_transform(em.embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS fx
    FROM embeddings em JOIN cand USING (vec_id)
  ),
  cb(s, cid, v) AS (VALUES {cb_vals}),
  q AS (
    SELECT list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS fx
    FROM embeddings WHERE vec_id = 0
  ),
  lut AS (
    SELECT cb.s, cb.cid,
           list_sum(list_transform(range(1, {dsub + 1}),
               i -> (q.fx[cb.s * {dsub} + i] - cb.v[i])
                    * (q.fx[cb.s * {dsub} + i] - cb.v[i]))) AS qd
    FROM cb CROSS JOIN q
  ),
  d AS (
    SELECT e.vec_id, cb.s, cb.cid,
           list_sum(list_transform(range(1, {dsub + 1}),
               i -> (e.fx[cb.s * {dsub} + i] - cb.v[i])
                    * (e.fx[cb.s * {dsub} + i] - cb.v[i]))) AS dist
    FROM e CROSS JOIN cb
  ),
  best AS (
    SELECT vec_id, s, cid,
           row_number() OVER (PARTITION BY vec_id, s
                              ORDER BY dist, cid) AS rn
    FROM d
  ),
  adc AS (
    SELECT b.vec_id, CAST(sum(l.qd) AS BIGINT) AS adc_fx
    FROM best b JOIN lut l ON l.s = b.s AND l.cid = b.cid
    WHERE b.rn = 1 GROUP BY b.vec_id
  )
SELECT CAST(row_number() OVER (ORDER BY adc_fx, vec_id) AS BIGINT) AS rank,
       vec_id, adc_fx
FROM adc ORDER BY rank LIMIT {k}"""


def emb_semdedup_sql(cent, threshold: float = 0.95) -> str:
    """SemDeDup oracle — the IVF assignment CTE (same embedded centroids
    and argmax tie rule as ann_ivf_topk_sql) names each vector's cluster;
    a vector survives unless a SAME-CLUSTER vector with a smaller vec_id
    sits within the cosine threshold — mirroring
    dedup_text.semdedup_survivors' keep-lowest-id rule."""
    dim = len(cent[0])
    vals = ",\n    ".join(
        "({}, [{}]::DOUBLE[])".format(i, ", ".join(repr(float(x)) for x in cent[i]))
        for i in range(len(cent))
    )
    return f"""WITH cent(list, v) AS (VALUES
    {vals}),
  dots AS (
    SELECT e.vec_id, c.list,
           (SELECT sum(CAST(e.embedding[u.i] AS DOUBLE) * c.v[u.i])
            FROM (SELECT unnest(generate_series(1, {dim})) AS i) u) AS d
    FROM embeddings e, cent c
  ),
  assign AS (
    SELECT vec_id, list FROM (
      SELECT vec_id, list,
             row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, list) AS rn
      FROM dots) WHERE rn = 1
  )
SELECT e.vec_id, CAST(a.list AS BIGINT) AS cluster
FROM embeddings e JOIN assign a ON a.vec_id = e.vec_id
WHERE NOT EXISTS (
  SELECT 1
  FROM embeddings e2 JOIN assign a2 ON a2.vec_id = e2.vec_id
  WHERE a2.list = a.list AND e2.vec_id < e.vec_id
    AND list_cosine_similarity(e.embedding, e2.embedding) >= {threshold}
)"""
