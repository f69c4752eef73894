"""ANN variants: recall of the bucketed paths against brute-force cosine."""

import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


@pytest.fixture(scope="module")
def query(emb):
    row = emb.filter("vec_id = 0").select("embedding").first()
    return [float(v) for v in row["embedding"]]


def _ids(df):
    return [r.vec_id for r in df.collect()]


def test_ivf_recall_and_probe_subset(emb, query):
    from sparkocr.pipeline.similarity import cosine_topk, ivf_topk

    exact = _ids(cosine_topk(emb, query, k=10))
    approx = _ids(ivf_topk(emb, query, k=10, n_cells=8, n_probe=4))
    assert len(approx) == 10
    # the query vector itself lives in a probed cell -> must be found
    assert exact[0] == approx[0] == 0
    # recall@10 of a 4/8-cell probe should be substantial
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.4, (recall, exact, approx)


def test_ivf_full_probe_equals_exact(emb, query):
    from sparkocr.pipeline.similarity import cosine_topk, ivf_topk

    exact = _ids(cosine_topk(emb, query, k=10))
    full = _ids(ivf_topk(emb, query, k=10, n_cells=8, n_probe=8))
    assert full == exact  # probing every cell degenerates to brute force


def test_lsh_topk_contains_query(emb, query):
    from sparkocr.pipeline.similarity import lsh_topk

    ids = _ids(lsh_topk(emb, query, k=10))
    assert ids and ids[0] == 0  # its own signature is hamming-0 from itself
