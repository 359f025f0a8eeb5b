from trade_data_collection_service_spark.ext.kmeans import fit


def test_kmeans_inertia_monotone_and_deterministic(spark, sf_dir):
    cents, inertia = fit(spark, sf_dir, k=4, max_iters=3)
    assert len(inertia) == 3
    # Lloyd's algorithm never increases inertia
    assert all(b <= a + 1e-6 for a, b in zip(inertia, inertia[1:]))
    rows = cents.collect()
    assert len(rows) <= 4
    assert all(len(r["centroid"]) == 64 for r in rows)
    # deterministic across runs
    _, inertia2 = fit(spark, sf_dir, k=4, max_iters=3)
    assert inertia == inertia2
