import json
import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")  # keep test JVM small


@pytest.fixture(scope="session")
def spark():
    from engine.session import get_spark
    s = get_spark(master="local[4]", app_name="engine-tests",
                  shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def fixture_corpus_pdf():
    from engine.corpus import make_corpus
    from engine.make_fixtures import FIXTURE_CORPUS_DOCS, FIXTURE_CORPUS_SEED
    return make_corpus(FIXTURE_CORPUS_DOCS, seed=FIXTURE_CORPUS_SEED)


@pytest.fixture(scope="session")
def fixtures_dir():
    d = os.path.join(os.path.dirname(__file__), "..", "fixtures")
    assert os.path.exists(os.path.join(d, "queries.json")), \
        "run: python -m engine.make_fixtures"
    return d


@pytest.fixture(scope="session")
def golden(fixtures_dir):
    with open(os.path.join(fixtures_dir, "queries.json")) as f:
        queries = json.load(f)
    with open(os.path.join(fixtures_dir, "topk_golden.json")) as f:
        rows = json.load(f)
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(
            (r["rank"], r["doc_id"], r["score"]))
    return queries, by_q


@pytest.fixture(scope="session")
def built_index(spark, fixture_corpus_pdf, tmp_path_factory):
    """One index build shared by e2e/invariant/query tests."""
    from engine.corpus import corpus_to_spark
    from engine.index_build import build_index
    out = str(tmp_path_factory.mktemp("index_build") / "idx")
    corpus_df = corpus_to_spark(spark, fixture_corpus_pdf)
    man = build_index(spark, corpus_df, out, n_salts=8, partitions=8)
    return out, man
