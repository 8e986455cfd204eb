"""Exact union-find differential for the closure-style sf10 parities
(r11 sf1 template): edges come from the byte-parity-VERIFIED pair
queries (q_dedup_ngram_jaccard / q_knn_graph at sf10), the closure is
exact union-find in Python, and the result is compared byte-for-byte
with the Spark dump of the composed query."""
import sys
import duckdb

con = duckdb.connect()

def components(edge_sql):
    parent = {}
    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r
    def union(a, b):
        for v in (a, b):
            if v not in parent:
                parent[v] = v
        ra, rb = find(a), find(b)
        if ra != rb:
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb
    for a, b in con.execute(edge_sql).fetchall():
        union(a, b)
    return {v: find(v) for v in parent}

MODES = ("components", "apply", "clusters")
if len(sys.argv) != 2 or sys.argv[1] not in MODES:
    sys.exit(f"usage: uf_diff.py {{{'|'.join(MODES)}}}")
mode = sys.argv[1]

if mode in ("components", "apply"):
    # pair set identical to q_dedup_ngram_jaccard's (verified at sf10)
    cc = components(
        "SELECT doc_a, doc_b FROM '/tmp/verify_sf10_dedup/q_dedup_ngram_jaccard/*.parquet'")
    if mode == "components":
        got = {(r[0], r[1]) for r in con.execute(
            "SELECT doc_id, component FROM '/tmp/verify_sf10_dedup/q_dedup_components/*.parquet'").fetchall()}
        want = set(cc.items())
    else:
        # q_dedup_apply survivors: every doc except non-root members
        drop = {v for v, r in cc.items() if v != r}
        got = {tuple(r) for r in con.execute(
            "SELECT doc_id, source, n_chars_kept FROM '/tmp/verify_sf10_dedup/q_dedup_apply/*.parquet'").fetchall()}
        want = {tuple(r) for r in con.execute(
            "SELECT doc_id, source, length(text) FROM '/tmp/sf10/documents.parquet'").fetchall()
            if r[0] not in drop}
elif mode == "clusters":
    cc = components(
        "SELECT vec_a, vec_b FROM '/tmp/verify_sf10_dedup/q_knn_graph/*.parquet'")
    got = {(r[0], r[1]) for r in con.execute(
        "SELECT vec_id, cluster FROM '/tmp/verify_sf10_dedup/q_semantic_clusters/*.parquet'").fetchall()}
    want = set(cc.items())

only_got = got - want
only_want = want - got
print(f"{mode}: got {len(got)} want {len(want)} "
      f"only_got {len(only_got)} only_want {len(only_want)}")
for x in list(only_got)[:3]:
    print("  spark-only:", x)
for x in list(only_want)[:3]:
    print("  oracle-only:", x)
sys.exit(0 if not only_got and not only_want else 1)
