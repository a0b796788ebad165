#!/usr/bin/env python3
"""Pre-registration DuckDB probe for the pl16 fuzzy-dedup stage:
counts saturated docs / verified cold pairs / CC non-min drops among
the exact-canonical train survivors at all three fixture scales, for a
candidate hot-band threshold H. Non-vacuity of BOTH guard legs and a
non-zero stage attrition at every scale is the registration bar
(the pl14 discipline: probe the modulus before choosing it)."""
import sys
import duckdb

H = int(sys.argv[1]) if len(sys.argv) > 1 else 3
MINJ = 0.3
PRIME = 2147483629


def splitmix64(seed):
    mask = (1 << 64) - 1
    z = (seed + 0x9e3779b97f4a7c15) & mask
    z = ((z ^ (z >> 30)) * 0xbf58476d1ce4e5b9) & mask
    z = ((z ^ (z >> 27)) * 0x94d049bb133111eb) & mask
    z = z ^ (z >> 31)
    return z - (1 << 64) if z >= (1 << 63) else z  # to signed


def coeffs(n):
    out = []
    for i in range(n):
        a = splitmix64(0x5eed + 2 * i) % (PRIME - 1) + 1
        b = splitmix64(0x5eed + 2 * i + 1) % PRIME
        out.append((a, b))
    return out


FPSQL = f"list_transform(sh, s -> ('0x' || substr(md5(s), 1, 8))::BIGINT % {PRIME})"
SIGSQL = "[" + ", ".join(
    f"list_min(list_transform(fp, x -> ({a} * x + {b}) % {PRIME}))"
    for a, b in coeffs(8)) + "]"

FUNNEL = """
toks AS (
  SELECT doc_id, lang,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> len(x) > 0) AS toks
  FROM documents),
enriched AS (
  SELECT t.doc_id, t.lang,
         CAST(len(toks) AS BIGINT) AS n_words,
         CASE WHEN len(toks) > 0
           THEN ROUND(CAST(list_sum(list_transform(toks, x -> len(x))) AS DOUBLE) / len(toks), 6)
           ELSE 0.0 END AS mean_word_len,
         CAST(len(d.text) - len(regexp_replace(d.text, '[#…]', '', 'g')) AS BIGINT) AS n_symbols,
         CASE WHEN len(toks) > 0
           THEN ROUND(CAST(len(list_filter(toks, x -> regexp_matches(x, '[a-z]'))) AS DOUBLE) / len(toks), 6)
           ELSE 0.0 END AS alpha_frac,
         CAST(len(list_intersect(list_distinct(toks),
           ['the','a','of','and','to','in'])) AS BIGINT) AS n_stop_hits,
         md5(array_to_string(list_sort(list_distinct(toks)), ' ')) AS fp,
         doc_id % 7 = 0 AS is_eval
  FROM toks t JOIN documents d USING (doc_id)),
k AS (
  SELECT *, CAST(n_words BETWEEN 50 AND 100000
        AND (n_words > 0 AND mean_word_len BETWEEN 3.0 AND 10.0)
        AND (n_words > 0 AND CAST(n_symbols AS DOUBLE) / n_words <= 0.1)
        AND alpha_frac >= 0.8 AND n_stop_hits >= 2 AS INT) AS kept
  FROM enriched),
train AS (SELECT * FROM k WHERE NOT is_eval),
q AS (SELECT * FROM train WHERE kept = 1),
canon AS (SELECT fp, MIN(doc_id) AS canonical_id FROM q GROUP BY fp),
exact AS (SELECT q.doc_id FROM q JOIN canon USING (fp) WHERE q.doc_id = canonical_id),
fsh AS (
  SELECT doc_id,
         list_distinct(CASE WHEN len(toks) >= 3
           THEN list_transform(generate_series(0, len(toks) - 3),
                               i -> array_to_string(list_slice(toks, i + 1, i + 3), ' '))
           ELSE [array_to_string(toks, ' ')] END) AS sh
  FROM toks JOIN exact USING (doc_id)),
ffp AS (SELECT doc_id, sh, {FPSQL} AS fp FROM fsh),
fsigs AS (SELECT doc_id, sh, {SIGSQL} AS sig FROM ffp),
fbands AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(0, 3),
           b -> md5(CAST(b AS VARCHAR) || chr(1) || CAST(sig[2*b+1] AS VARCHAR)
                    || chr(1) || CAST(sig[2*b+2] AS VARCHAR)))) AS bk
  FROM fsigs),
fcounts AS (SELECT bk, COUNT(DISTINCT doc_id) AS cnt FROM fbands GROUP BY bk),
fhot AS (SELECT bk FROM fcounts WHERE cnt >= {H}),
fsat AS (SELECT DISTINCT doc_id FROM fbands JOIN fhot USING (bk)),
fcold AS (SELECT doc_id, bk FROM fbands WHERE bk NOT IN (SELECT bk FROM fhot)),
fcand AS (
  SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
  FROM fcold a JOIN fcold b ON a.bk = b.bk AND a.doc_id < b.doc_id),
fver AS (
  SELECT a, b FROM fcand
  JOIN fsh sa ON sa.doc_id = fcand.a JOIN fsh sb ON sb.doc_id = fcand.b
  WHERE CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
        / len(list_distinct(list_concat(sa.sh, sb.sh))) >= {MINJ}),
fedges AS (SELECT a, b FROM fver UNION ALL SELECT b, a FROM fver),
freach AS (
  SELECT a AS node, a AS r FROM fedges
  UNION
  SELECT re.node, e.b FROM freach re JOIN fedges e ON re.r = e.a),
fcomp AS (SELECT node, MIN(r) AS component FROM freach GROUP BY node),
fdrop AS (SELECT DISTINCT doc_id FROM (
            SELECT doc_id FROM fsat
            UNION ALL SELECT node FROM fcomp WHERE node <> component))
"""


def probe(sf):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('/root/testdata/{sf}/documents.parquet')")
    sql = ("WITH RECURSIVE "
           + FUNNEL.format(H=H, MINJ=MINJ, FPSQL=FPSQL, SIGSQL=SIGSQL) + """
      , fsurv AS (SELECT doc_id FROM exact
                  WHERE doc_id NOT IN (SELECT doc_id FROM fdrop)),
      K13 AS (SELECT doc_id,
                list_distinct(list_transform(
                  CASE WHEN len(toks) >= 13
                    THEN list_transform(generate_series(0, len(toks) - 13),
                         i -> array_to_string(list_slice(toks, i + 1, i + 13), ' '))
                    ELSE []::VARCHAR[] END,
                  g -> ('0x' || substr(md5(g), 1, 15))::BIGINT)) AS grams
              FROM toks),
      ev AS (SELECT DISTINCT unnest(grams) AS gram FROM K13
             WHERE doc_id % 7 = 0),
      flagged AS (SELECT DISTINCT tg.doc_id FROM (
          SELECT u.doc_id, unnest(t.grams) AS gram
          FROM fsurv u JOIN K13 t ON u.doc_id = t.doc_id) tg
        JOIN ev ON tg.gram = ev.gram)
      SELECT (SELECT COUNT(*) FROM exact) AS n_exact,
             (SELECT COUNT(*) FROM fsat) AS n_sat,
             (SELECT COUNT(*) FROM fver) AS n_ver_pairs,
             (SELECT COUNT(*) FROM fcomp WHERE node <> component) AS n_cc_drop,
             (SELECT COUNT(*) FROM fdrop) AS n_drop,
             (SELECT COUNT(*) FROM fsurv) AS n_fsurv,
             (SELECT COUNT(*) FROM flagged) AS n_flagged""")
    row = con.execute(sql).fetchone()
    print(f"{sf}: H={H} exact_survivors={row[0]} saturated={row[1]} "
          f"verified_pairs={row[2]} cc_nonmin={row[3]} stage_drop={row[4]} "
          f"fuzzy_survivors={row[5]} decontam_flagged={row[6]}")


for sf in ["sf0.001", "sf0.01", "sf0.1"]:
    probe(sf)
