"""X45 BPE training: the distributed merge table must match a pure-
Python reference implementation EXACTLY (same corpus, same tie rules)."""

from __future__ import annotations

from collections import Counter, defaultdict

from etl_airflow_spotify_spark.operators.bpe import EOW, train_bpe


def _py_bpe(texts, n_merges, with_stats=False):
    wf = Counter()
    for t in texts:
        for w in t.strip().lower().split():
            wf[w] += 1
    vocab = {}
    for w, f in wf.items():
        syms = list(w)
        syms[-1] = syms[-1] + EOW
        vocab[w] = (tuple(syms), f)
    merges = []
    for rank in range(1, n_merges + 1):
        pc = defaultdict(int)
        for syms, f in vocab.values():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += f
        if not pc:
            break
        # max count, ties -> lexicographically smallest pair
        (a, b), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        ab = a + b
        for w, (syms, f) in vocab.items():
            out = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = ab
                else:
                    out.append(s)
            vocab[w] = (tuple(out), f)
        if with_stats:
            total = sum(len(syms) * f for syms, f in vocab.values())
            merges.append((rank, a, b, cnt, total))
        else:
            merges.append((rank, a, b, cnt))
    return merges


def _corpus_df(spark, texts):
    return spark.createDataFrame([(t,) for t in texts], "text string")


def test_bpe_matches_python_reference_toy(spark):
    texts = ["low low low lower lowest", "new newer newest new new",
             "wide wider widest low new"]
    got = train_bpe(_corpus_df(spark, texts), 8)
    assert got == _py_bpe(texts, 8)
    got_s = [tuple(t) for t in
             train_bpe(_corpus_df(spark, texts), 4, with_stats=True)]
    assert got_s == _py_bpe(texts, 4, with_stats=True)


def test_bpe_overlapping_runs_merge_left_to_right(spark):
    # "aaaa": pair (a,a) merges non-overlapping left-to-right
    texts = ["aaaa aaaa aa b"]
    got = train_bpe(_corpus_df(spark, texts), 3)
    assert got == _py_bpe(texts, 3)
    # first merge is the interior (a, a) pair
    assert (got[0][1], got[0][2]) == ("a", "a")


def test_bpe_on_sf_documents(spark, sf_dir):
    from etl_airflow_spotify_spark.catalog import load_table

    d = load_table(spark, sf_dir, "documents")
    texts = [r["text"] for r in d.select("text").collect()]
    got = train_bpe(d, 6)
    assert got == _py_bpe(texts, 6)
