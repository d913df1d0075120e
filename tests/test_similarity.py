"""Product-quantization ANN: encode twin + ADC semantics."""


def test_pq_encode_matches_numpy_twin(spark):
    """PQ codes equal the numpy per-subspace argmin; ADC top-1 recovers
    the exact nearest neighbor on well-separated data, and the ADC
    distance equals the sum of table lookups computed in Python."""
    import numpy as np
    from warc2text_spark.operators.similarity import pq_encode, pq_topk
    rng = np.random.default_rng(11)
    # 2 subspaces of dim 2; 4 centroids each, well separated
    codebooks = [
        [[0.0, 0.0], [10.0, 0.0], [0.0, 10.0], [10.0, 10.0]],
        [[0.0, 0.0], [-10.0, 0.0], [0.0, -10.0], [-10.0, -10.0]],
    ]
    rows = []
    for i in range(40):
        c1, c2 = rng.integers(0, 4), rng.integers(0, 4)
        vec = (np.array(codebooks[0][c1] + codebooks[1][c2])
               + rng.normal(0, 0.3, 4))
        rows.append((i, [float(x) for x in vec], int(c1), int(c2)))
    df = spark.createDataFrame(
        [(i, v) for i, v, _, _ in rows],
        "vec_id long, embedding array<double>")
    enc = {r.vec_id: list(r.pq_code)
           for r in pq_encode(df, codebooks).collect()}
    for i, vec, _, _ in rows:
        v = np.array(vec)
        exp = [int(np.argmin([np.sum((v[2*j:2*j+2] - np.array(c)) ** 2)
                              for c in codebooks[j]])) for j in range(2)]
        assert enc[i] == exp, (i, enc[i], exp)
    # ADC: query near centroid pair (1, 2) -> top hits share that code
    query = [9.8, 0.1, 0.2, -9.7]
    top = pq_topk(df, query, codebooks, k=5).collect()
    want = [i for i, _, c1, c2 in rows if (c1, c2) == (1, 2)]
    got_ids = [r.vec_id for r in top]
    assert set(got_ids[:len(want[:5])]) <= set(want) or not want
    # ADC distance equals the python table-lookup sum
    tables = [[sum((q - c[d]) ** 2 for d, q in
                   enumerate([query[2*j], query[2*j+1]]))
               for c in codebooks[j]] for j in range(2)]
    by_id = {i: (c1, c2) for i, _, c1, c2 in rows}
    for r in top:
        c = enc[r.vec_id]
        exp_d = round(tables[0][c[0]] + tables[1][c[1]], 4)
        assert abs(r.approx_dist - exp_d) < 1e-6


def test_pq_excludes_malformed_rows_and_ranks_precomputed_codes(spark):
    """Review regressions: NULL / wrong-dimension vectors must not
    encode (their NULL subcodes alias real ADC distances); pq_topk over
    a precomputed codes frame matches the convenience form."""
    from warc2text_spark.operators.similarity import pq_encode, pq_topk
    codebooks = [
        [[0.0, 0.0], [10.0, 0.0]],
        [[0.0, 0.0], [0.0, -10.0]],
    ]
    rows = [(1, [0.1, 0.0, 0.0, -9.9]), (2, [9.9, 0.1, 0.1, 0.2]),
            (3, None), (4, [1.0, 2.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    enc = pq_encode(df, codebooks)
    assert {r.vec_id for r in enc.collect()} == {1, 2}
    q = [0.0, 0.0, 0.0, -10.0]
    direct = [(r.vec_id, r.approx_dist)
              for r in pq_topk(df, q, codebooks, k=4).collect()]
    assert [v for v, _ in direct] == [1, 2]          # malformed excluded
    via_codes = [(r.vec_id, r.approx_dist)
                 for r in pq_topk(df, q, codebooks, k=4,
                                  codes=enc).collect()]
    assert via_codes == direct
