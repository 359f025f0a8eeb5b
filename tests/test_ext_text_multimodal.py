from trade_data_collection_service_spark.ext.multimodal import (
    extract_features,
    media_from_documents,
)
from trade_data_collection_service_spark.ext.text import (
    fingerprint,
    lang_id,
    quality_score,
    token_stats,
)


def test_token_stats_against_python(spark, sf_dir):
    stats = {r["doc_id"]: r for r in token_stats(spark, sf_dir).collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20).collect()
    for d in docs:
        toks = d["text"].lower().split()
        s = stats[d["doc_id"]]
        assert s["n_tokens"] == len(toks)
        assert s["n_distinct_tokens"] == len(set(toks))
        assert s["n_chars_measured"] == len(d["text"])
        assert s["n_subword_units"] == sum(-(-len(t) // 4) for t in toks)


def test_lang_id_scores(spark, sf_dir):
    rows = lang_id(spark, sf_dir).collect()
    assert all(r["predicted_lang"] in ("en", "es", "de") for r in rows)
    for r in rows[:50]:
        best = max(("en", "es", "de"), key=lambda L: r[f"score_{L}"])
        assert r[f"score_{r['predicted_lang']}"] == r[f"score_{best}"]


def test_quality_bounds(spark, sf_dir):
    rows = quality_score(spark, sf_dir).collect()
    for r in rows:
        assert 0.0 < r["distinct_ratio"] <= 1.0
        assert 0.0 <= r["stopword_ratio"] < 1.0
        assert 0.0 <= r["quality_score"] <= 1.0


def test_fingerprint_stability(spark, sf_dir):
    a = {r["doc_id"]: (r["fp_md5"], r["fp_min_shingle"]) for r in fingerprint(spark, sf_dir).collect()}
    b = {r["doc_id"]: (r["fp_md5"], r["fp_min_shingle"]) for r in fingerprint(spark, sf_dir).collect()}
    assert a == b
    assert all(len(v[0]) == 32 for v in a.values())


def test_multimodal_arrow_plumbing(spark, sf_dir):
    media = media_from_documents(spark, sf_dir)
    feats = {r["media_id"]: r for r in extract_features(media).collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20).collect()
    for d in docs:
        f = feats[d["doc_id"]]
        n = len(d["text"].encode("utf-8"))
        assert f["n_bytes"] == n
        assert abs(f["fake_feature"] - round((n % 256) / 255.0, 6)) < 1e-9
