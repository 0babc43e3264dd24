"""Deterministic synthetic source-code corpus in the BASELINE.json input_hint
shape: ``(repo, path, commit, lang, content)`` + ``content_sha256``.

Analog of the reference's ``crawl`` table
(searchEngine/src/cis5550/crawler/Crawler.java:113-124) with the content-seen
hash invariant (Crawler.java:177-190, tools/Hasher.java:7-16 — SHA-1 there,
upgraded to sha256 per input_hint).

Vocabulary is Zipf-distributed with a hot head of real code keywords so term
skew is real and the salted index merge is actually exercised (SURVEY.md §7.2).
Doc identity: int64 from the first 8 bytes of
sha256(repo || '/' || path || '@' || commit), masked positive (replaces the
reference's Hasher.hash(url) row key, Crawler.java:55).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

LANGS = ["python", "java", "js", "go", "c"]
LANG_WEIGHTS = [0.35, 0.25, 0.2, 0.1, 0.1]

# Hot head: real code keywords (the stopword analog driving skew).
KEYWORDS = [
    "def", "return", "int", "for", "if", "else", "import", "class", "self",
    "new", "public", "static", "void", "string", "function", "var", "const",
    "let", "struct", "func", "range", "len", "nil", "null", "true", "false",
    "while", "break", "continue", "try", "except", "catch", "throw", "print",
]


def _vocab(size: int) -> list[str]:
    return KEYWORDS + [f"identifier_{k}" for k in range(size - len(KEYWORDS))]


def doc_id_of(repo: str, path: str, commit: str) -> int:
    h = hashlib.sha256(f"{repo}/{path}@{commit}".encode()).digest()
    return int.from_bytes(h[:8], "big") & 0x7FFF_FFFF_FFFF_FFFF


def content_sha256(content: str) -> str:
    return hashlib.sha256(content.encode()).hexdigest()


def make_corpus(n_docs: int, seed: int = 42, vocab_size: int = 2000,
                min_tokens: int = 50, max_tokens: int = 400) -> pd.DataFrame:
    """Generate the corpus as a pandas DataFrame (deterministic for a seed).

    Columns: repo, path, commit, lang, content, content_sha256, doc_id.
    """
    rng = np.random.default_rng(seed)
    vocab = np.array(_vocab(vocab_size), dtype=object)
    # Zipf ranks: P(rank r) ~ 1/(r+1)^1.1, normalized
    ranks = np.arange(vocab_size, dtype=np.float64)
    probs = 1.0 / (ranks + 1.0) ** 1.1
    probs /= probs.sum()

    rows = []
    lens = rng.integers(min_tokens, max_tokens + 1, size=n_docs)
    langs = rng.choice(LANGS, size=n_docs, p=LANG_WEIGHTS)
    for i in range(n_docs):
        repo = f"org{i % 7}/repo{i % 23}"
        path = f"src/pkg{i % 13}/mod{i}.{langs[i][:2]}"
        commit = hashlib.sha256(f"{repo}/{path}".encode()).hexdigest()[:12]
        toks = vocab[rng.choice(vocab_size, size=lens[i], p=probs)]
        # newline-joined pseudo-statements of ~8 tokens
        parts = [" ".join(toks[j:j + 8]) for j in range(0, len(toks), 8)]
        content = "\n".join(parts)
        rows.append((repo, path, commit, str(langs[i]), content))

    df = pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])
    df["content_sha256"] = [content_sha256(c) for c in df["content"]]
    df["doc_id"] = [doc_id_of(r, p, c)
                    for r, p, c in zip(df["repo"], df["path"], df["commit"])]
    if df["doc_id"].nunique() != len(df):
        raise AssertionError("doc_id collision in synthetic corpus")
    return df


def corpus_spark_schema():
    from pyspark.sql import types as T
    return T.StructType([
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("commit", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
        T.StructField("content", T.StringType(), False),
        T.StructField("content_sha256", T.StringType(), False),
        T.StructField("doc_id", T.LongType(), False),
    ])


def corpus_to_spark(spark, pdf: pd.DataFrame):
    return spark.createDataFrame(pdf, schema=corpus_spark_schema())


def make_corpus_spark(spark, n_docs: int, seed: int = 42,
                      vocab_size: int = 2000, min_tokens: int = 50,
                      max_tokens: int = 400, partitions: int = 64):
    """Distributed synthetic corpus: same schema/statistics as make_corpus
    but generated in parallel executors (deterministic per doc index), for
    benchmark corpora too large to build on the driver."""
    import pyarrow as pa
    from pyspark.sql import functions as F

    vocab = np.array(_vocab(vocab_size), dtype=object)
    ranks = np.arange(vocab_size, dtype=np.float64)
    probs = 1.0 / (ranks + 1.0) ** 1.1
    probs /= probs.sum()
    langs = np.array(LANGS, dtype=object)
    lang_w = np.array(LANG_WEIGHTS)

    def gen(batches):
        import hashlib
        for rb in batches:
            ids = rb.column("id").to_numpy(zero_copy_only=False)
            out = {"repo": [], "path": [], "commit": [], "lang": [],
                   "content": [], "content_sha256": [], "doc_id": []}
            for i in ids.tolist():
                rng = np.random.default_rng(seed * 1_000_003 + i)
                lang = str(langs[int(rng.choice(len(langs), p=lang_w))])
                repo = f"org{i % 7}/repo{i % 23}"
                path = f"src/pkg{i % 13}/mod{i}.{lang[:2]}"
                commit = hashlib.sha256(
                    f"{repo}/{path}".encode()).hexdigest()[:12]
                ln = int(rng.integers(min_tokens, max_tokens + 1))
                toks = vocab[rng.choice(vocab_size, size=ln, p=probs)]
                parts = [" ".join(toks[j:j + 8])
                         for j in range(0, len(toks), 8)]
                content = "\n".join(parts)
                out["repo"].append(repo)
                out["path"].append(path)
                out["commit"].append(commit)
                out["lang"].append(lang)
                out["content"].append(content)
                out["content_sha256"].append(content_sha256(content))
                out["doc_id"].append(doc_id_of(repo, path, commit))
            yield pa.RecordBatch.from_arrays(
                [pa.array(out["repo"], pa.string()),
                 pa.array(out["path"], pa.string()),
                 pa.array(out["commit"], pa.string()),
                 pa.array(out["lang"], pa.string()),
                 pa.array(out["content"], pa.string()),
                 pa.array(out["content_sha256"], pa.string()),
                 pa.array(out["doc_id"], pa.int64())],
                names=["repo", "path", "commit", "lang", "content",
                       "content_sha256", "doc_id"])

    return (spark.range(n_docs).repartition(partitions)
            .mapInArrow(gen, schema="repo string, path string, commit string,"
                        " lang string, content string, content_sha256 string,"
                        " doc_id long"))
