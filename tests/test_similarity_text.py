"""Similarity-search and text-operator tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from biglake_iceberg_pipeline_spark.operators import similarity, text


def test_brute_force_topk_orders_by_cosine(spark):
    rows = [
        (1, [1.0, 0.0]),
        (2, [0.9, 0.1]),
        (3, [0.0, 1.0]),
        (4, [-1.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = similarity.brute_force_topk(
        df, "vec_id", "embedding", [1.0, 0.0], k=3
    ).collect()
    assert [r["vec_id"] for r in out] == [1, 2, 3]
    assert out[0]["cosine_sim"] == 1.0


def test_ivf_topk_is_subset_of_brute_force_recall(spark, sf_dir):
    from biglake_iceberg_pipeline_spark.plans.llm_ops import ann_ivf, ann_topk

    exact = [r["vec_id"] for r in ann_topk(spark, sf_dir).collect()]
    approx = [r["vec_id"] for r in ann_ivf(spark, sf_dir).collect()]
    # query vector itself always survives probing (same code, ham 0)
    assert exact[0] == approx[0] == 0
    # sanity recall: approximate hits overlap exact top-k
    assert len(set(approx) & set(exact)) >= 3


def test_detect_language(spark):
    rows = [
        (1, "the cat is a friend of the dog"),
        (2, "der hund und die katze ist das tier"),
        (3, "le chat et la souris est les amis"),
        (4, "xyzzy qwerty plugh"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    out = {
        r["id"]: r["p"]
        for r in df.select(
            "id", text.detect_language(F.col("text")).alias("p")
        ).collect()
    }
    assert out == {1: "en", 2: "de", 3: "fr", 4: "und"}


def test_quality_features_ranges(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox is on the hill")], "id long, text string"
    )
    r = text.quality_features(df, "text").collect()[0]
    assert r["q_n_words"] == 8
    assert 0.0 <= r["q_score"] <= 1.0
    assert r["q_stopword_ratio"] == 0.375  # the, is, the


def test_rolling_fingerprint_deterministic(spark):
    df = spark.createDataFrame([("abc",), ("abc",), ("abd",)], "t string")
    vals = [
        r[0]
        for r in df.select(text.rolling_fingerprint(F.col("t"))).collect()
    ]
    assert vals[0] == vals[1] != vals[2]
    # hand-check: ((0*31+97)%p*31+98)%p*31+99 % p
    p = 1000000007
    expect = ((97 * 31 + 98) * 31 + 99) % p
    assert vals[0] == expect


def test_multimodal_plumbing(spark):
    from biglake_iceberg_pipeline_spark.operators import multimodal

    df = spark.createDataFrame(
        [(1, "hello"), (2, "")], "doc_id long, text string"
    )
    media = multimodal.documents_as_media(df)
    out = {r["media_id"]: r for r in multimodal.extract_features(media).collect()}
    assert out[1]["payload_bytes"] == 5
    assert len(out[1]["features"]) == multimodal.FEATURE_DIM
    assert out[1]["features"][0] == 5.0
    assert out[2]["features"] == [0.0] * multimodal.FEATURE_DIM


def test_approx_event_stats_within_tolerance(spark, sf_dir, duck):
    """Sketch estimates must track the exact answers: HLL ndv within
    5% relative error, t-digest p50/p99 within the value spread."""
    from biglake_iceberg_pipeline_spark.plans.analytics import (
        approx_event_stats,
    )

    got = {r.event_type: r for r in approx_event_stats(spark, sf_dir).collect()}
    exact = {
        r[0]: (r[1], r[2], r[3])
        for r in duck.execute(
            """
            SELECT event_type, COUNT(DISTINCT user_id),
                   quantile_disc(value, 0.5), quantile_disc(value, 0.99)
            FROM events GROUP BY 1
            """
        ).fetchall()
    }
    assert set(got) == set(exact)
    for et, (ndv, p50, p99) in exact.items():
        assert abs(got[et].approx_users - ndv) / ndv < 0.05
        spread = max(1e-9, p99 - p50)
        assert abs(got[et].approx_p50_value - p50) < 0.25 * spread
        assert abs(got[et].approx_p99_value - p99) < 0.25 * spread


def test_l2_normalize_produces_unit_vectors(spark):
    from pyspark.sql import functions as F

    from biglake_iceberg_pipeline_spark.operators.similarity import (
        l2_norm,
        l2_normalize,
    )

    df = spark.createDataFrame(
        [(1, [3.0, 4.0]), (2, [0.0, 0.0]), (3, [1.0, 0.0])],
        "id long, v array<double>",
    )
    out = df.select(
        "id",
        l2_norm(l2_normalize(F.col("v"))).alias("n"),
        l2_normalize(F.col("v")).alias("u"),
    )
    got = {r.id: (r.n, r.u) for r in out.collect()}
    assert abs(got[1][0] - 1.0) < 1e-12 and got[1][1] == [0.6, 0.8]
    assert got[2][0] == 0.0 and got[2][1] == [0.0, 0.0]  # zero passthrough
    assert abs(got[3][0] - 1.0) < 1e-12


def test_ivf_index_probe_prunes_partitions(spark, sf_dir, tmp_path):
    """The materialized index must (a) agree with the index-free probe
    on results, (b) show a partition filter in the physical plan, and
    (c) keep recall vs brute force."""
    from biglake_iceberg_pipeline_spark.operators import vector_index
    from biglake_iceberg_pipeline_spark.sources.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    q = list(emb.where(F.col("vec_id") == 0).first()["embedding"])
    path = str(tmp_path / "ivf")
    vector_index.build_ivf_index(
        emb, path, "vec_id", "embedding", dim=len(q)
    )
    probe = vector_index.ivf_probe(
        spark, path, "vec_id", "embedding", q, k=10
    )
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "__code" in plan

    got = [(r.vec_id, r.cosine_sim) for r in probe.collect()]
    scan_free = similarity.ivf_topk(
        emb, "vec_id", "embedding", q, k=10
    ).collect()
    assert got == [(r.vec_id, r.cosine_sim) for r in scan_free]

    exact = similarity.brute_force_topk(
        emb, "vec_id", "embedding", q, k=10
    ).collect()
    assert got[0][0] == exact[0]["vec_id"] == 0
    assert len({g[0] for g in got} & {r["vec_id"] for r in exact}) >= 3


def test_int8_ivf_recall_pruning_and_scan_bytes(spark, sf_dir, tmp_path):
    """The quantized index must (a) probe partition-pruned, (b) keep
    recall at least as good as the float sign-bit index's pin (same
    probe geometry, scoring differs only by bounded rounding error),
    and (c) actually be smaller on disk — the scan-I/O reduction that
    is the reason to quantize at 100 TB."""
    import os

    from biglake_iceberg_pipeline_spark.operators import vector_index
    from biglake_iceberg_pipeline_spark.sources.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    q = list(emb.where(F.col("vec_id") == 0).first()["embedding"])
    fpath, ipath = str(tmp_path / "f32"), str(tmp_path / "i8")
    vector_index.build_ivf_index(emb, fpath, "vec_id", "embedding", dim=len(q))
    vector_index.build_ivf_index_int8(
        emb, ipath, "vec_id", "embedding", dim=len(q)
    )

    probe = vector_index.ivf_probe_int8(spark, ipath, "vec_id", q, k=10)
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "__code" in plan

    got = [r["vec_id"] for r in probe.collect()]
    exact = [
        r["vec_id"]
        for r in similarity.brute_force_topk(
            emb, "vec_id", "embedding", q, k=10
        ).collect()
    ]
    f32 = [
        r["vec_id"]
        for r in vector_index.ivf_probe(
            spark, fpath, "vec_id", "embedding", q, k=10
        ).collect()
    ]
    assert got[0] == exact[0] == 0  # the query vector itself
    # recall vs brute force >= the float index's own recall (same
    # partitions probed; int8 rounding moves scores by < scale/2)
    assert len(set(got) & set(exact)) >= len(set(f32) & set(exact))
    assert len(set(got) & set(exact)) >= 3  # the sign-bit pin

    def column_bytes(root, col_prefixes):
        """Compressed bytes of the vector-payload columns across all
        files — the probe's actual scan I/O. File-count metadata
        overhead (footers) is excluded: at test scale it dominates
        raw directory size, at 100 TB it vanishes."""
        import pyarrow.parquet as pq

        total = 0
        for r, _d, names in os.walk(root):
            for n in names:
                if not n.endswith(".parquet"):
                    continue
                meta = pq.ParquetFile(os.path.join(r, n)).metadata
                for rg in range(meta.num_row_groups):
                    g = meta.row_group(rg)
                    for ci in range(g.num_columns):
                        c = g.column(ci)
                        if any(
                            c.path_in_schema.startswith(p)
                            for p in col_prefixes
                        ):
                            total += c.total_compressed_size
        return total

    f32_payload = column_bytes(fpath, ("embedding",))
    i8_payload = column_bytes(ipath, ("q_codes", "q_scale"))
    # int8 codes + one double scale vs float64 components: the scan
    # payload must shrink by well over 2x (theoretical ~7x at dim=16)
    assert i8_payload < 0.5 * f32_payload, (i8_payload, f32_payload)


def test_probe_codes_hamming_ball():
    from biglake_iceberg_pipeline_spark.operators.vector_index import (
        probe_codes,
    )
    from biglake_iceberg_pipeline_spark.operators.similarity import (
        signbit_code_py,
    )

    vec = [0.5, -1.0, 0.25, 2.0]
    qcode = signbit_code_py(vec, planes=8)
    codes = probe_codes(vec, planes=8, nprobe_hamming=1)
    assert qcode in codes and len(codes) == 9  # center + 8 one-bit flips
    assert all(bin(c ^ qcode).count("1") <= 1 for c in codes)


def _make_bmp(width, height, rgb_rows):
    """Minimal 24-bit BMP encoder (test-side, stdlib struct)."""
    import struct

    row_bytes = (width * 3 + 3) & ~3
    pad = b"\x00" * (row_bytes - width * 3)
    # bottom-up, BGR
    body = b"".join(
        b"".join(bytes([b, g, r]) for (r, g, b) in row) + pad
        for row in reversed(rgb_rows)
    )
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + len(body), 0, 0, 54
    ) + struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body), 0, 0, 0, 0
    )
    return header + body


def _make_wav(samples, rate=8000):
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(
            b"".join(struct.pack("<h", int(s * 32767)) for s in samples)
        )
    return buf.getvalue()


def test_bmp_decode_real(spark):
    from biglake_iceberg_pipeline_spark.operators import multimodal

    # 2x2: red, green / blue, white
    bmp = _make_bmp(
        2, 2,
        [[(255, 0, 0), (0, 255, 0)], [(0, 0, 255), (255, 255, 255)]],
    )
    img = multimodal.decode_bmp(bmp)
    assert img.shape == (2, 2, 3)
    assert list(img[0, 0]) == [255, 0, 0] and list(img[1, 1]) == [255, 255, 255]
    feats = multimodal.decode_image(bmp)
    assert feats[0] == 2.0 and feats[1] == 2.0  # width, height
    assert feats[-1] == 1.0  # real decode, not fallback
    up = multimodal.resize_nearest(img, 4, 4)
    assert up.shape == (4, 4, 3) and list(up[0, 0]) == [255, 0, 0]


def test_wav_decode_real():
    import math

    from biglake_iceberg_pipeline_spark.operators import multimodal

    wav = _make_wav(
        [math.sin(2 * math.pi * 440 * i / 8000) * 0.5 for i in range(800)]
    )
    samples, rate, n_ch = multimodal.decode_wav(wav)
    assert rate == 8000 and n_ch == 1 and len(samples) == 800
    feats = multimodal.decode_image(wav)  # dispatches on RIFF magic
    assert feats[1] == 8000.0 and 0.2 < feats[3] < 0.5  # rate, rms of 0.5 sine
    assert feats[-1] == 1.0


def test_mixed_media_batch_through_spark(spark):
    """Real BMP + real WAV + unknown bytes in ONE mapInPandas pass."""
    from biglake_iceberg_pipeline_spark.operators import multimodal

    bmp = _make_bmp(2, 1, [[(10, 20, 30), (40, 50, 60)]])
    wav = _make_wav([0.1] * 100)
    rows = [
        (1, bytearray(bmp), "image/bmp", 2, 1),
        (2, bytearray(wav), "audio/wav", 0, 0),
        (3, bytearray(b"\xff\xd8not-really-jpeg"), "image/jpeg", 0, 0),
    ]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in multimodal.extract_features(media).collect()}
    assert out[1]["features"][-1] == 1.0   # BMP really decoded
    assert out[2]["features"][-1] == 1.0   # WAV really decoded
    assert out[3]["features"][-1] == 0.0   # fallback flagged
    assert out[2]["features"][1] == 8000.0


def test_sample_frames_keeps_every_kth(spark):
    from biglake_iceberg_pipeline_spark.operators import multimodal

    frames = [bytearray([i]) for i in range(10)]
    df = spark.createDataFrame(
        [(1, frames)], "vid long, frames array<binary>"
    )
    out = multimodal.sample_frames(df, "frames", 3).collect()[0]
    kept = [bytes(b)[0] for b in out["frames_sampled"]]
    assert kept == [0, 3, 6, 9]


def test_kmeans_ivf_recall_and_pruning(spark, sf_dir, tmp_path):
    """Trained-codebook IVF: nprobe=n_centroids probes everything
    (exact = brute force); a partial probe reads only the probed
    partitions (plan-asserted) and keeps useful recall."""
    from biglake_iceberg_pipeline_spark.operators.similarity import (
        brute_force_topk,
    )
    from biglake_iceberg_pipeline_spark.operators.vector_index import (
        build_kmeans_ivf_index,
        kmeans_ivf_probe,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    path = str(tmp_path / "kmidx")
    cents = build_kmeans_ivf_index(
        emb, path, "vec_id", "embedding", n_centroids=8
    )
    assert len(cents) == 8 and len(cents[0]) > 0
    q = list(emb.where("vec_id = 0").first()["embedding"])
    exact = [
        r["vec_id"]
        for r in brute_force_topk(emb, "vec_id", "embedding", q, k=10)
        .collect()
    ]
    # full probe == brute force (every partition read)
    full = [
        r["vec_id"]
        for r in kmeans_ivf_probe(
            spark, path, "vec_id", "embedding", q, k=10, nprobe=8
        ).collect()
    ]
    assert full == exact
    # partial probe: partition-pruned scan, decent recall
    probe = kmeans_ivf_probe(
        spark, path, "vec_id", "embedding", q, k=10, nprobe=3
    )
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    got = [r["vec_id"] for r in probe.collect()]
    recall = len(set(got) & set(exact)) / 10
    assert recall >= 0.5, (recall, got, exact)
    # the query's own vector lives in a probed partition -> rank 1
    assert got[0] == 0


def test_cosine_kernel_variants_bit_identical(spark):
    """The three cosine implementations (interpreted HOF fold, unrolled
    codegen, Arrow/numpy kernel) must agree BIT-FOR-BIT — they all
    promise the oracle's sequential fold order."""
    from biglake_iceberg_pipeline_spark.operators.dedup import cosine
    from biglake_iceberg_pipeline_spark.operators.similarity import (
        cosine_vs_literal,
        cosine_vs_literal_unrolled,
        _vec_lit,
    )

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).limit(50)
    q = list(emb.where("vec_id = 0").first()["embedding"])
    out = emb.select(
        "vec_id",
        cosine(F.col("embedding"), _vec_lit(q)).alias("hof"),
        cosine_vs_literal_unrolled(F.col("embedding"), q).alias("unrolled"),
        cosine_vs_literal(F.col("embedding"), q).alias("arrow"),
    ).collect()
    for r in out:
        assert r["hof"] == r["unrolled"] == r["arrow"], r


def test_cosine_kernels_null_and_ragged_vectors(spark):
    """NULL or wrong-length embeddings must yield NULL cosine (the
    interpreted fold's null propagation), not crash the Arrow kernel's
    vstack — one bad row must not fail the whole task."""
    from biglake_iceberg_pipeline_spark.operators.dedup import cosine_pandas
    from biglake_iceberg_pipeline_spark.operators.similarity import (
        cosine_vs_literal,
    )

    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0], [1.0, 0.0, 0.0]),
            (2, None, [1.0, 0.0, 0.0]),
            (3, [1.0, 0.0], [1.0, 0.0, 0.0]),     # ragged pair
            (4, [0.0, 1.0, 0.0], None),
            (5, [], []),                            # empty
            (6, [0.0, 2.0, 0.0], [0.0, 1.0, 0.0]),
        ],
        "id long, a array<double>, b array<double>",
    )
    pair = {
        r["id"]: r["c"]
        for r in df.select(
            "id", cosine_pandas(F.col("a"), F.col("b")).alias("c")
        ).collect()
    }
    assert pair[1] == 1.0 and pair[6] == 1.0
    assert pair[2] is None and pair[3] is None
    assert pair[4] is None and pair[5] is None

    lit = {
        r["id"]: r["c"]
        for r in df.select(
            "id",
            cosine_vs_literal(F.col("a"), [1.0, 0.0, 0.0]).alias("c"),
        ).collect()
    }
    assert lit[1] == 1.0 and lit[6] == 0.0
    assert lit[2] is None and lit[3] is None and lit[5] is None


def test_lakehouse_pq_index_register_probe_maintain(spark, tmp_path):
    """USING IVF_PQ on the registered-index seam: registration trains
    codebooks and stores m-byte codes; probes ADC-shortlist then
    re-rank against the table floats (same output shape as flat);
    appends maintain the index incrementally with the REGISTERED
    codebooks; the staleness guard applies unchanged."""
    from biglake_iceberg_pipeline_spark.operators import vector_index as vi
    from biglake_iceberg_pipeline_spark.sinks.lakehouse import (
        LakehouseTable,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    t = LakehouseTable(str(tmp_path / "vecs"))
    t.append(emb.where("vec_id < 400"))
    vi.register_lakehouse_index(
        spark, t, "embedding", "vec_id", planes=4, kind="pq",
        pq_m=16, pq_k=16, pq_sample_n=1024,
    )
    assert t.vector_index_meta()["embedding"]["kind"] == "pq"
    q = list(emb.where("vec_id = 42").select("embedding").first()[0])
    got = vi.probe_lakehouse_index(spark, t, "embedding", q, k=5).collect()
    assert got[0]["vec_id"] == 42 and got[0]["cosine_sim"] == 1.0
    assert list(got[0].asDict()) == ["vec_id", "cosine_sim"]
    # the stored payload is pq_code bytes, not float arrays
    idx = spark.read.parquet(t.vector_index_meta()["embedding"]["path"])
    assert dict(idx.dtypes)["pq_code"] == "binary"
    assert "embedding" not in idx.columns
    n_before = idx.count()
    # incremental maintenance: appended rows coded with the
    # registered codebooks, index grows by exactly the batch
    t.append(emb.where("vec_id >= 400"))
    idx2 = spark.read.parquet(t.vector_index_meta()["embedding"]["path"])
    assert idx2.count() == n_before + emb.where("vec_id >= 400").count()
    q2 = list(emb.where("vec_id = 450").select("embedding").first()[0])
    got2 = vi.probe_lakehouse_index(spark, t, "embedding", q2, k=3).collect()
    assert got2[0]["vec_id"] == 450
    # row-rewriting commits trip the staleness guard, rebuild heals
    t.delete_where(spark, F.col("vec_id") == 0)
    import pytest as _pytest

    with _pytest.raises(vi.StaleVectorIndexError):
        vi.probe_lakehouse_index(spark, t, "embedding", q, k=3)
    got3 = vi.probe_lakehouse_index(
        spark, t, "embedding", q, k=3, on_stale="rebuild"
    ).collect()
    assert got3[0]["vec_id"] == 42


def test_filtered_probe_returns_k_matching_rows(spark, sf_dir):
    """VERDICT r10 item 6: filtering WHILE probing returns the top-k
    MATCHING rows — exactly brute-force-with-filter restricted to the
    probed partitions — where filter-after-top-k under-returns."""
    from biglake_iceberg_pipeline_spark.operators.vector_index import (
        ivf_probe,
        probe_codes,
    )
    from biglake_iceberg_pipeline_spark.operators.similarity import (
        cosine_vs_literal,
        signbit_code,
    )
    from biglake_iceberg_pipeline_spark.plans.llm_ops import (
        _ivf_index_path,
        _query_vec,
    )
    from biglake_iceberg_pipeline_spark.sources.catalog import load_table

    q = _query_vec(spark, sf_dir)
    path = _ivf_index_path(spark, sf_dir)
    filtered = ivf_probe(
        spark, path, "vec_id", "embedding", q, k=5,
        where=F.col("label") == 1,
    ).collect()
    assert filtered and all(r["cosine_sim"] is not None for r in filtered)
    got = [r["vec_id"] for r in filtered]

    # reference: brute force with the SAME filter over the SAME
    # probed partitions (the recall contract of a filtered probe)
    emb = load_table(spark, sf_dir, "embeddings")
    codes = probe_codes(q, 8, 1)
    ref = (
        emb.where(F.col("label") == 1)
        .where(
            signbit_code(F.col("embedding"), 8, dim=len(q)).isin(codes)
        )
        .select(
            "vec_id",
            F.round(
                cosine_vs_literal(F.col("embedding"), q), 4
            ).alias("cosine_sim"),
        )
        .orderBy(F.desc("cosine_sim"), "vec_id")
        .limit(5)
        .collect()
    )
    assert got == [r["vec_id"] for r in ref]
    # every returned row satisfies the predicate (semantics filter-
    # after-top-k could only satisfy by dropping below k rows)
    labels = {
        r["vec_id"]: r["label"]
        for r in emb.select("vec_id", "label").collect()
    }
    assert all(labels[v] == 1 for v in got)


def test_filtered_probe_pushes_predicate_into_scan(spark, sf_dir):
    """The label predicate reaches the parquet scan of the probed
    partitions (PushedFilters), and partition pruning still holds."""
    from biglake_iceberg_pipeline_spark.operators.vector_index import (
        ivf_probe,
    )
    from biglake_iceberg_pipeline_spark.plans.llm_ops import (
        _ivf_index_path,
        _query_vec,
    )

    q = _query_vec(spark, sf_dir)
    df = ivf_probe(
        spark, _ivf_index_path(spark, sf_dir), "vec_id", "embedding",
        q, k=5, where=F.col("label") == 1,
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    assert "EqualTo(label,1)" in plan, plan[:2000]


def test_lakehouse_filtered_probe_include_cols_maintained(
    spark, tmp_path
):
    """register(include_cols) carries metadata into the index; an
    append maintains it incrementally; probe(where=) filters through
    the lakehouse entry point."""
    from biglake_iceberg_pipeline_spark.operators.vector_index import (
        probe_lakehouse_index,
        register_lakehouse_index,
    )
    from biglake_iceberg_pipeline_spark.sinks.lakehouse import (
        LakehouseTable,
    )

    rows = [
        (i, [1.0 * i, 1.0, 0.5], i % 2) for i in range(20)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, emb array<double>, label int"
    )
    t = LakehouseTable(str(tmp_path / "t"))
    t.append(df)
    register_lakehouse_index(
        spark, t, "emb", "vec_id", include_cols=["label"]
    )
    t.append(
        spark.createDataFrame(
            [(100, [5.0, 1.0, 0.5], 1), (101, [5.1, 1.0, 0.5], 0)],
            "vec_id long, emb array<double>, label int",
        )
    )
    out = probe_lakehouse_index(
        spark, t, "emb", [5.0, 1.0, 0.5], k=4,
        where=F.col("label") == 1, nprobe_hamming=8,
    ).collect()
    got = [r["vec_id"] for r in out]
    assert 100 in got  # appended row is probe-visible (maintained)
    assert 101 not in got  # filtered out during the probe
    assert len(got) == 4  # k MATCHING rows, not an under-filled list


def test_filtered_probe_int8_and_kmeans_variants(spark, tmp_path):
    """where= on the quantized and trained-centroid probes: the
    builders carry metadata via include_cols and the predicate
    applies inside the probed partitions — same contract as the
    float probe."""
    from biglake_iceberg_pipeline_spark.operators.vector_index import (
        build_ivf_index_int8,
        build_kmeans_ivf_index,
        ivf_probe_int8,
        kmeans_ivf_probe,
    )

    rows = [
        (i, [float(i), 1.0, 0.5], i % 2) for i in range(1, 41)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, emb array<double>, label int"
    )
    q = [40.0, 1.0, 0.5]

    p8 = str(tmp_path / "int8")
    build_ivf_index_int8(
        df, p8, "vec_id", "emb", dim=3, include_cols=["label"]
    )
    got = ivf_probe_int8(
        spark, p8, "vec_id", q, k=4, nprobe_hamming=8,
        where=F.col("label") == 1,
    ).collect()
    ids = [r["vec_id"] for r in got]
    assert len(ids) == 4 and all(v % 2 == 1 for v in ids)

    pk = str(tmp_path / "km")
    build_kmeans_ivf_index(
        df, pk, "vec_id", "emb", n_centroids=4,
        include_cols=["label"],
    )
    got = kmeans_ivf_probe(
        spark, pk, "vec_id", "emb", q, k=4, nprobe=4,
        where="label = 0",
    ).collect()
    ids = [r["vec_id"] for r in got]
    assert len(ids) == 4 and all(v % 2 == 0 for v in ids)


def test_kmeans_filtered_probe_matches_filtered_brute_force(
    spark, sf_dir, tmp_path
):
    """Filtered probe on the TRAINED tier (r12): the label predicate
    applies INSIDE the pruned cells and the top-k is over MATCHING
    rows — identical to brute-force-with-filter restricted to the
    probed cells, and k rows come back (post-filtering would
    under-return)."""
    import numpy as np

    from biglake_iceberg_pipeline_spark.operators import (
        similarity,
        vector_index as vi,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    path = str(tmp_path / "kf")
    vi.build_kmeans_ivf_index(
        emb, path, "vec_id", "embedding", n_centroids=16,
        include_cols=["label"],
    )
    q = list(emb.where("vec_id = 0").select("embedding").first()[0])
    got = vi.kmeans_ivf_probe(
        spark, path, "vec_id", "embedding", q, k=10, nprobe=4,
        where=F.col("label") == 1,
    ).collect()
    assert len(got) == 10
    labels = {
        r["vec_id"]: r["label"]
        for r in emb.select("vec_id", "label").collect()
    }
    assert all(labels[r["vec_id"]] == 1 for r in got)
    # equality with filter-then-rank within the probed cells
    import json, os

    cents = np.asarray(
        json.load(open(os.path.join(path, "_centroids.json"))),
        dtype=np.float64,
    )
    d = ((cents - np.asarray(q)[None, :]) ** 2).sum(axis=1)
    probe = [int(c) for c in d.argsort()[:4]]
    cells = spark.read.parquet(path).where(
        F.col("__cid").isin(probe) & (F.col("label") == 1)
    )
    exact = [
        r["vec_id"]
        for r in similarity.brute_force_topk(
            cells, "vec_id", "embedding", q, k=10
        ).collect()
    ]
    assert [r["vec_id"] for r in got] == exact



def test_ann_kmeans_filtered_query_and_fill_assertion(spark):
    """The REGISTERED query end-to-end (r12 review: the property test
    above exercises only the operator): k rows back, every one
    label==1; and the in-plan fill assertion actually EXECUTES — an
    earlier draft's dropped assert column was pruned away silently,
    so force an under-return through the same _asserted_fill plumbing
    and require the raise."""
    import pytest

    from biglake_iceberg_pipeline_spark.plans import llm_ops

    sf = "/root/testdata/sf0.001"
    got = llm_ops.ann_kmeans_filtered(spark, sf).collect()
    assert len(got) == 10
    labels = {
        r["vec_id"]: r["label"]
        for r in spark.read.parquet(f"{sf}/embeddings.parquet")
        .select("vec_id", "label")
        .collect()
    }
    assert all(labels[r["vec_id"]] == 1 for r in got)
    # forced under-return: 3 rows through a k=10 fill check raises
    three = spark.createDataFrame(
        [(1, 0.9), (2, 0.8), (3, 0.7)], "vec_id long, cosine_sim double"
    )
    with pytest.raises(Exception, match="under-returned"):
        llm_ops._asserted_fill(three, 10).collect()


def test_tier_selector_trained_wins_on_uniform_corpus(
    spark, sf_dir, tmp_path
):
    """G44: on the near-uniform synthetic embeddings corpus the
    recall audit routes production probes to the TRAINED k-means
    tier — fixed sign-bit hyperplanes capture no neighbor structure
    here (the r12 audit finding this selector operationalizes) —
    and selected_probe follows the recorded verdict."""
    from biglake_iceberg_pipeline_spark.operators.vector_index import (
        select_coarse_tier,
        selected_probe,
    )
    from biglake_iceberg_pipeline_spark.sources.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    root = str(tmp_path / "tiers")
    v = select_coarse_tier(spark, emb, "vec_id", "embedding", root)
    assert v["winner"] == "kmeans"
    assert (
        v["recall_at_k"]["kmeans"]
        > v["recall_at_k"]["signbit"] + 0.05
    )
    # the audit recorded per-query baselines for the sample
    assert str(v["query_ids"][0]) in v["per_query"]
    qvec = list(
        emb.where(F.col("vec_id") == 0).select("embedding").first()[0]
    )
    got = selected_probe(
        spark, root, "vec_id", "embedding", qvec, k=10
    )
    assert got.count() == 10
    # routed to the kmeans layout: the probed parquet is cell-
    # partitioned (one __cid directory per trained centroid)
    import os

    assert os.path.isdir(os.path.join(root, "kmeans"))
    assert any(
        d.startswith("__cid=")
        for d in os.listdir(os.path.join(root, "kmeans"))
    )


def test_tier_selector_signbit_wins_on_clustered_corpus(spark, tmp_path):
    """G44, the other verdict: on a hyperplane-friendly corpus (tight
    well-separated clusters) BOTH tiers reach full recall, so the
    selector keeps the sign-bit layout for its smaller scanned
    fraction — 9 hamming-1 codes of ~100 populated vs 4 of 16
    trained cells. Recall ties break toward the cheaper probe."""
    import numpy as np

    from biglake_iceberg_pipeline_spark.operators.vector_index import (
        select_coarse_tier,
    )

    rng = np.random.RandomState(7)
    centers = rng.normal(size=(100, 16))
    rows = []
    i = 0
    for c in range(100):
        for _ in range(20):
            rows.append(
                (i, (centers[c] + 0.01 * rng.normal(size=16)).tolist())
            )
            i += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    v = select_coarse_tier(
        spark, df, "vec_id", "embedding", str(tmp_path / "tiers")
    )
    assert v["winner"] == "signbit"
    assert v["recall_at_k"]["signbit"] >= 0.9
    assert v["recall_at_k"]["kmeans"] >= 0.9
    assert (
        v["scan_fraction"]["signbit"] < v["scan_fraction"]["kmeans"]
    )


def test_asserted_recall_floor_trips(spark):
    """The in-plan recall floor fails the QUERY when the probe's
    result diverges from the exact set — assert_true-as-filter, so
    column pruning cannot drop the check (the G43 idiom)."""
    import pytest

    from biglake_iceberg_pipeline_spark.plans.llm_ops import (
        _asserted_recall,
    )

    out = spark.createDataFrame(
        [(1, 0.9), (2, 0.8)], "vec_id long, cosine_sim double"
    )
    good = spark.createDataFrame([(1,), (2,)], "vec_id long")
    bad = spark.createDataFrame([(7,), (8,)], "vec_id long")
    ok = _asserted_recall(out, good, "vec_id", 2, 1.0)
    assert ok.count() == 2
    assert ok.columns == ["vec_id", "cosine_sim"]
    trips = _asserted_recall(out, bad, "vec_id", 2, 0.5)
    with pytest.raises(Exception, match="recall floor breached"):
        trips.collect()
