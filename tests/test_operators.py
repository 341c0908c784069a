"""Unit tests for the custom operator library (as-of strategies agree,
LSH recall vs brute force, multimodal plumbing, numpy ANN variant)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from risingwave_spark.operators.asof import asof_join_backward, asof_join_merge
from risingwave_spark.operators.multimodal import decode_meta, frame_sample_stub, resize_stub
from risingwave_spark.operators.similarity import cosine_topk, cosine_topk_numpy
from risingwave_spark.queries.util import tables
from tests.conftest import SF_DIR


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def t(spark):
    return tables(spark, SF_DIR)


def test_asof_strategies_agree(spark, t):
    """union-window and merge_asof strategies must produce identical
    matches (same keys, ts, payload)."""
    ev = t["events"]
    purchases = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy(F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"))
        .agg(F.max("event_id").alias("click_id"))
    )
    a = asof_join_backward(purchases, clicks, "user_id", "c_user", "ts", "c_ts", ["click_id"])
    b = asof_join_merge(purchases, clicks, "user_id", "c_user", "ts", "c_ts", ["click_id"])
    assert _rows(a) == _rows(b)


def test_asof_left_keeps_unmatched(spark, t):
    ev = t["events"]
    purchases = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    # clicks restricted to a few users → other purchases must survive with null payload
    clicks = (
        ev.filter((F.col("event_type") == "click") & (F.col("user_id") < 5))
        .groupBy(F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"))
        .agg(F.max("event_id").alias("click_id"))
    )
    left = asof_join_backward(
        purchases, clicks, "user_id", "c_user", "ts", "c_ts", ["click_id"], how="left"
    )
    assert left.count() == purchases.count()
    assert left.filter(F.col("click_id").isNull()).count() > 0


def test_numpy_topk_matches_hof(spark, t):
    """The GEMM (mapInPandas) ANN path must agree with the JVM HOF path on
    float cosine ranking (modulo float rounding → compare id sets)."""
    e = t["embeddings"]
    q = e.filter(F.col("vec_id") < 3)
    hof = cosine_topk(e, q, k=3, round_digits=4)
    qrows = [(r.vec_id, r.embedding) for r in q.collect()]
    gemm = cosine_topk_numpy(e, qrows, k=3)
    assert sorted((r.query_id, r.neighbor_id) for r in hof.collect()) == sorted(
        (r.query_id, r.neighbor_id) for r in gemm.collect()
    )


def test_multimodal_plumbing(spark, t):
    docs = t["documents"].limit(50).withColumn("payload", F.col("text").cast("binary"))
    meta = decode_meta(docs)
    assert meta.count() == 50
    r = meta.select("meta.n_bytes", "meta.checksum", "meta.width").first()
    assert r["n_bytes"] > 0 and len(r["checksum"]) == 32 and 0 <= r["width"] < 4096

    rs = resize_stub(docs, "doc_id", "payload", 224, 224)
    assert rs.filter((F.col("target_w") == 224) & (F.col("target_h") == 224)).count() == 50

    fr = frame_sample_stub(docs, "doc_id", "payload", max_frames=3)
    per = fr.groupBy("doc_id").count()
    assert per.agg(F.max("count")).first()[0] <= 3
    assert fr.select(F.octet_length("frame").alias("n")).distinct().first().n == 16


def test_connector_builders_construct(spark):
    """Connector builders (risingwave_spark/sources) construct readers/
    writers without contacting anything; jar-gated parts raise cleanly."""
    import pytest as _pytest

    from risingwave_spark import sources as S

    r = S.kafka_source(spark, "broker:9092", "t")
    assert r is not None  # configured DataStreamReader
    rate = S.rate_source(spark, 10)
    assert rate.isStreaming
    sink = S.jdbc_upsert_sink("jdbc:postgresql://h/db", "t", ["id"])
    with _pytest.raises(NotImplementedError):
        sink(rate, 0)


def test_jsonb_path_guards():
    """Unsupported JSONPath features must raise, not silently misread."""
    import pytest

    from risingwave_spark.functions.jsonpath import (
        jsonb_path_exists,
        jsonb_path_match,
    )

    with pytest.raises(ValueError, match="unsupported"):
        jsonb_path_exists("j", "$.a[*] ? (@ > 2)")
    with pytest.raises(ValueError, match="unsupported"):
        jsonb_path_exists("j", "$.a.size()")
    with pytest.raises(ValueError, match="cannot parse"):
        jsonb_path_match("j", "not a predicate")


def test_wire_format_decoders_edge_cases():
    """Pure-Python Avro/Protobuf decoders: negative ints (zigzag +
    two's-complement), nullable unions, unknown-field skipping, doubles,
    and the Confluent envelope guard."""
    import math

    import pytest

    from risingwave_spark.sources.decoders import (
        avro_decode_record,
        avro_encode_record,
        confluent_unwrap,
        confluent_wrap,
        proto_decode_message,
        proto_encode_message,
    )

    schema = [
        ("a", "long"), ("b", "?string"), ("c", "double"),
        ("d", "boolean"), ("e", "bytes"), ("f", "?long"),
    ]
    row = {"a": -12345678901, "b": None, "c": -0.125, "d": True, "e": b"\x00\xff", "f": 42}
    assert avro_decode_record(schema, avro_encode_record(schema, row)) == row

    fields = {1: ("x", "int64"), 2: ("y", "sint64"), 3: ("s", "string"),
              4: ("d", "double"), 5: ("b", "bool")}
    msg = {"x": -7, "y": -99999, "s": "héllo", "d": math.pi, "b": False}
    enc = proto_encode_message({**fields, 9: ("junk", "string")}, {**msg, "b": True, "junk": "zzz"})
    got = proto_decode_message(fields, enc)
    assert got["x"] == -7 and got["y"] == -99999 and got["s"] == "héllo"
    assert got["d"] == math.pi and got["b"] is True
    assert "junk" not in got  # unknown field skipped by wire type

    sid, payload = confluent_unwrap(confluent_wrap(123456, b"data"))
    assert sid == 123456 and payload == b"data"
    with pytest.raises(ValueError, match="magic"):
        confluent_unwrap(b"\x01xxxx")


def test_file_schema_registry_contract(tmp_path):
    """File-backed Confluent registry (reference schema_registry.rs):
    version assignment, idempotent re-register, id fetch, loud miss."""
    import pytest as _pytest

    from risingwave_spark.sources.schema_registry import FileSchemaRegistry

    reg = FileSchemaRegistry(str(tmp_path / "reg"))
    v1 = [("a", "long")]
    v2 = [("a", "long"), ("b", "?string")]
    id1 = reg.register("t-value", v1)
    assert reg.register("t-value", v1) == id1  # idempotent
    id2 = reg.register("t-value", v2)
    assert id2 != id1
    assert reg.latest("t-value") == (id2, [("a", "long"), ("b", "?string")])
    # a fresh client (new executor) resolves ids from disk
    reg2 = FileSchemaRegistry(str(tmp_path / "reg"))
    assert reg2.get(id1) == [("a", "long")]
    with _pytest.raises(KeyError, match="not found"):
        reg2.get(999)


def test_aes_fips_vectors_and_modes():
    """functions/aescrypt.py against the public FIPS-197 appendix-C and
    NIST SP 800-38A vectors, plus mode-string parsing and padding edges
    (reference encrypt.rs CipherConfig contract)."""
    import pytest as _pt

    from risingwave_spark.functions.aescrypt import (
        _encrypt_block,
        _expand_key,
        decrypt,
        encrypt,
    )

    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    assert _encrypt_block(pt, _expand_key(bytes(range(16)))).hex() == (
        "69c4e0d86a7b0430d8cdb78070b4c55a"
    )
    assert _encrypt_block(pt, _expand_key(bytes(range(24)))).hex() == (
        "dda97ca4864cdfe06eaf70a0ec0d7191"
    )
    assert _encrypt_block(pt, _expand_key(bytes(range(32)))).hex() == (
        "8ea2b7ca516745bfeafc49904b496089"
    )
    k = bytes.fromhex("2b7e151628aed2a6abf7158809cf4f3c")
    p1 = bytes.fromhex("6bc1bee22e409f96e93d7e117393172a")
    assert encrypt(p1, k, "aes-ecb/pad:none").hex() == (
        "3ad77bb40d7a3660a89ecaf32466ef97"
    )
    for mode in ("aes", "aes-cbc", "aes-ecb", "aes-cbc/pad:pkcs"):
        data = b"arbitrary length secret payload"
        for key in (bytes(range(16)), bytes(range(24)), bytes(range(32))):
            assert decrypt(encrypt(data, key, mode), key, mode) == data
    with _pt.raises(ValueError, match="invalid mode"):
        encrypt(b"x", bytes(16), "des-cbc")
    with _pt.raises(ValueError, match="key length"):
        encrypt(b"x", bytes(10), "aes")
    with _pt.raises(ValueError, match="block size"):
        encrypt(b"short", bytes(16), "aes-ecb/pad:none")
    with _pt.raises(ValueError, match="padding"):
        decrypt(encrypt(b"0123456789abcdef", bytes(16), "aes-ecb/pad:none"), bytes(16), "aes-ecb")


def test_kmeans_refine_matches_numpy(spark, t):
    """Distributed Lloyd refinement (map-side assignment + one avg-agg
    shuffle of k*dims partials per iteration) must match a driver-side
    numpy reference: same cosine assignment, same per-cluster means,
    same empty-cell fallback."""
    from risingwave_spark.operators.similarity import ivf_seed_centroids, kmeans_refine

    e = t["embeddings"].filter(F.col("vec_id") < 120)
    seeds = [c[1] for c in ivf_seed_centroids(e, n_centroids=4)]
    # seeds come back as 2^20-scaled ints — unscale to floats for the
    # float-path refinement (kmeans_refine is the production path)
    seeds_f = [[x / (1 << 20) for x in c] for c in seeds]
    got = kmeans_refine(e, seeds_f, iters=2)

    rows = e.select("vec_id", "embedding").orderBy("vec_id").collect()
    mat = np.array([list(r.embedding) for r in rows], dtype="float64")
    cur = np.array(seeds_f, dtype="float64")
    for _ in range(2):
        sims = (mat @ cur.T) / (
            np.linalg.norm(mat, axis=1)[:, None] * np.linalg.norm(cur, axis=1)[None, :]
        )
        assign = sims.argmax(axis=1)  # ties → lowest cid, same as struct argmax
        nxt = cur.copy()
        for cid in range(len(cur)):
            members = mat[assign == cid]
            if len(members):
                nxt[cid] = members.mean(axis=0)
        cur = nxt
    assert np.allclose(np.array(got), cur, rtol=1e-9, atol=1e-12)

    # refined float centroids feed cosine_topk_ivf directly — the
    # adapter scales them to (cid, int_vec, sq) tuples (ADVICE r7: the
    # docstring promised this handoff but the types didn't line up)
    from risingwave_spark.operators.similarity import centroids_as_tuples, cosine_topk_ivf

    tup = centroids_as_tuples(got)
    assert [c[0] for c in tup] == [0, 1, 2, 3]
    assert all(
        isinstance(v, int) for c in tup for v in c[1]
    ) and all(c[2] == sum(v * v for v in c[1]) for c in tup)
    # already-tuple input passes through unchanged
    assert centroids_as_tuples(tup) == tup
    out = cosine_topk_ivf(
        e, lambda vid: vid < 3, n_centroids=4, nprobe=2, k=2, centroids=got
    )
    assert out.count() == 6  # 3 queries × k=2, no tuple-unpack crash


def test_ivf_assignment_is_map_side(spark, t):
    """The IVF cluster assignment must compile to a pure projection —
    no Exchange (shuffle) and no join below it; at 100 TB this is what
    lets the cluster id be a write-time partition column."""
    from risingwave_spark.operators.similarity import (
        ivf_cluster,
        ivf_seed_centroids,
        scaled_with_sqnorm,
    )

    e = t["embeddings"]
    cents = ivf_seed_centroids(e, n_centroids=4)
    base = scaled_with_sqnorm(e, "vec_id", "embedding", "v")
    assigned = base.select("v_id", ivf_cluster(F.col("v_vec"), F.col("v_sq"), cents).alias("cluster"))
    plan = assigned._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan
    # and it actually buckets: every vector lands in a valid cell
    clusters = {r["cluster"] for r in assigned.collect()}
    assert clusters <= {c[0] for c in cents}


def test_connected_components_labels_clusters(spark):
    """Min-label propagation resolves transitive duplicate clusters:
    {1-2, 2-3} and {7-9} are separate components; singletons absent
    from the edge list are not labeled (they are their own keeper)."""
    from risingwave_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 9), (9, 7)], "a int, b int"
    )
    got = {
        (r["node"], r["component"])
        for r in connected_components(edges, "a", "b").collect()
    }
    assert got == {(1, 1), (2, 1), (3, 1), (7, 7), (9, 7)}


def test_connected_components_long_chain_converges(spark):
    """A 12-node path graph needs multiple propagation rounds; the
    iterated join must still converge to one component labeled by the
    minimum id."""
    from risingwave_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "a int, b int"
    )
    rows = connected_components(edges, "a", "b").collect()
    assert {r["component"] for r in rows} == {0}
    assert {r["node"] for r in rows} == set(range(13))


def test_pack_sequences_boundary_split(spark):
    """A doc spanning a block cut contributes its token overlap to both
    sequences; totals reconcile to the corpus token count."""
    from risingwave_spark.operators.textual import pack_sequences

    df = spark.createDataFrame(
        [(1, "a b c", "x"), (2, "d e f g", "x"), (3, "h i", "x")],
        "id int, txt string, grp string",
    )
    rows = {r["seq_id"]: r for r in pack_sequences(df, "id", "txt", "grp", block=4).collect()}
    # tokens: doc1 [0,3), doc2 [3,7), doc3 [7,9) → seq0 = doc1(3)+doc2(1),
    # seq1 = doc2(3)+doc3(1), seq2 = doc3(1)
    assert (rows[0]["n_docs"], rows[0]["n_tokens"]) == (2, 4)
    assert (rows[1]["n_docs"], rows[1]["n_tokens"]) == (2, 4)
    assert (rows[2]["n_docs"], rows[2]["n_tokens"]) == (1, 1)
    assert sum(r["n_tokens"] for r in rows.values()) == 9


def test_decontaminate_flags_overlap_only(spark):
    """Docs sharing a 4-gram with the benchmark are flagged; others not."""
    from risingwave_spark.operators.textual import decontaminate

    bench = spark.createDataFrame([(100, "the quick brown fox jumps")], "id int, txt string")
    corpus = spark.createDataFrame(
        [(1, "see the quick brown fox run"), (2, "a completely different doc here")],
        "id int, txt string",
    )
    got = {r["id"]: r for r in decontaminate(corpus, bench, "id", "txt", n=4).collect()}
    assert got[1]["contaminated"] and got[1]["n_hit_grams"] == 1
    assert not got[2]["contaminated"] and got[2]["n_hit_grams"] == 0


def test_pii_scrub_counts_and_negative_control(spark):
    """Emails/IPs/phones are replaced with typed tags and counted; a bare
    domain (no @) survives untouched."""
    from risingwave_spark.operators.textual import pii_scrub

    df = spark.createDataFrame(
        [("mail a@b.com and c.d@e.org ip 10.0.0.1 call +1-555-0199 site example.org",)],
        "s string",
    )
    r = df.select(pii_scrub(F.col("s")).alias("r")).select("r.*").collect()[0]
    assert (r["n_email"], r["n_ipv4"], r["n_phone"]) == (2, 1, 1)
    assert r["scrubbed"] == "mail <EMAIL> and <EMAIL> ip <IPV4> call <PHONE> site example.org"


def test_pack_sequences_layout_independent(spark):
    """Packing is data-ordered (part, id), not arrival-ordered: the same
    corpus under different partition layouts packs identically — the
    reproducibility contract a training pipeline needs."""
    from risingwave_spark.operators.textual import pack_sequences

    rows = [(i, " ".join(["w"] * (3 + i % 7)), f"g{i % 3}") for i in range(60)]
    df1 = spark.createDataFrame(rows, "id int, txt string, grp string")
    df2 = df1.repartition(13, "txt")
    out1 = sorted(tuple(r) for r in pack_sequences(df1, "id", "txt", "grp", block=16).collect())
    out2 = sorted(tuple(r) for r in pack_sequences(df2, "id", "txt", "grp", block=16).collect())
    assert out1 == out2 and len(out1) > 3


def test_jaccard_gram_table_not_reused_across_calls(spark):
    """r12 measurement-honesty contract: jaccard_pairs must recompute its
    gram table on EVERY call (no cross-call memo of intermediates — a
    min-of-N bench rep must pay the full per-call cost), while still
    keeping at most ONE persisted gram table live (no leak, ADVICE r4)."""
    from risingwave_spark.operators import dedup

    docs = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "the quick brown fox!"), (3, "zzz")],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame([(1, 2)], "a long, b long")
    r1 = dedup.jaccard_pairs(pairs, docs, "doc_id", "text").collect()
    g1 = dedup._GRAM_CACHE[-1]
    r2 = dedup.jaccard_pairs(pairs, docs, "doc_id", "text").collect()
    g2 = dedup._GRAM_CACHE[-1]
    assert r1 == r2
    # same corpus, second call: a NEW gram table was built (no reuse) ...
    assert g1 is not g2
    # ... and the registry holds exactly the one fresh entry (the
    # previous persist was evicted; storageLevel can't distinguish the
    # two here — Spark's CacheManager matches by canonicalized plan)
    assert len(dedup._GRAM_CACHE) == 1 and dedup._GRAM_CACHE[-1] is g2
    assert g2.storageLevel.useMemory or g2.storageLevel.useDisk


def test_minhash_signature_codegen_equals_hof(spark):
    """r12 session-5: minhash_signature was rewritten from interpreted
    array-HOFs (transform + fused aggregate() struct pass) to a codegen'd
    explode → md5 → groupBy-min pipeline. Pin bit-identity against the
    old HOF form on the edge cases the corpus doesn't cover: NULL text,
    empty text, text shorter than k, whitespace-only text (normalizes to
    ''), and a repeated-shingle doc."""
    from risingwave_spark.operators.dedup import (
        MINHASH_P,
        minhash_a,
        minhash_b,
        minhash_signature,
        with_shingles,
    )

    docs = spark.createDataFrame(
        [
            (1, None),
            (2, ""),
            (3, "ab"),
            (4, "   \t  "),
            (5, "abcabcabcabc"),
            (6, "The QUICK   brown fox jumps over the lazy dog"),
        ],
        "doc_id long, text string",
    )
    num_hashes, k = 8, 5

    # reference: the pre-session-5 array-HOF form (array_min over
    # transform of the shingle array), kept here as the semantic spec
    d = with_shingles(docs.select(F.col("doc_id").alias("doc"), "text"), "text", k)
    base = F.transform(
        "__sh",
        lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long") % MINHASH_P,
    )
    d = d.withColumn("__base", base)
    ref = d.select(
        "doc",
        *[
            F.array_min(
                F.transform(
                    "__base",
                    lambda h: (F.lit(minhash_a(i)) * h + F.lit(minhash_b(i))) % MINHASH_P,
                )
            ).alias(f"mh{i}")
            for i in range(num_hashes)
        ],
    )

    got = minhash_signature(docs, "doc_id", "text", num_hashes, k)
    assert _rows(got) == _rows(ref)
    # null text yields an all-null signature (min over {null})
    null_row = [r for r in got.collect() if r["doc"] == 1][0]
    assert all(null_row[f"mh{i}"] is None for i in range(num_hashes))
