# encoding=utf-8
"""Smoke + semantics tests for the training-data operators.

(Exact oracle equivalence is checked by scripts/check_correctness.py /
the driver; these tests pin operator semantics and determinism.)
"""

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


class TestTextOps:
    def test_token_counts(self, ray_session):
        from kgx.textops import token_counts

        df = token_counts(SF).to_pandas()
        assert len(df) == 500
        assert (df["n_tokens"] > 0).all()

    def test_fingerprint_deterministic(self, ray_session):
        from kgx.textops import fingerprint

        df1 = fingerprint(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
        df2 = fingerprint(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
        assert (df1["fp"] == df2["fp"]).all()
        assert df1["fp"].nunique() == 500  # unique texts → unique fingerprints

    def test_lang_id_runs(self, ray_session):
        from kgx.textops import lang_id

        df = lang_id(SF).to_pandas()
        assert set(df["lang_pred"]) <= {"en", "de", "fr", "es", "zh", "und"}

    def test_quality_ratios_matches_local(self, ray_session):
        import re

        import pyarrow.parquet as pq

        from kgx.textops import _LANG_PROFILES, quality_ratios

        df = quality_ratios(SF).to_pandas().set_index("doc_id")
        t = pq.read_table("%s/documents.parquet" % SF,
                          columns=["doc_id", "text"])
        stop = _LANG_PROFILES["en"]
        for doc_id, text in zip(t.column("doc_id").to_pylist()[:40],
                                t.column("text").to_pylist()[:40]):
            assert df.loc[doc_id, "n_punct"] == len(
                re.findall(r"[^A-Za-z0-9\s]", text))
            assert df.loc[doc_id, "n_stopwords"] == sum(
                1 for x in text.lower().split(" ") if x in stop)

    def test_token_counts_bpe_matches_re(self, ray_session):
        import re

        import pyarrow.parquet as pq

        from kgx.textops import _BPE_PATTERN, token_counts_bpe

        df = token_counts_bpe(SF).to_pandas().set_index("doc_id")
        t = pq.read_table("%s/documents.parquet" % SF,
                          columns=["doc_id", "text"])
        pat = re.compile(_BPE_PATTERN)
        for doc_id, text in zip(t.column("doc_id").to_pylist()[:50],
                                t.column("text").to_pylist()[:50]):
            assert df.loc[doc_id, "n_bpe_tokens"] == len(pat.findall(text))

    def test_top_terms_matches_local_count(self, ray_session):
        from collections import Counter

        import pyarrow.parquet as pq

        from kgx.textops import top_terms

        df = top_terms(SF, k=20).to_pandas()
        t = pq.read_table("%s/documents.parquet" % SF, columns=["text"])
        counts = Counter()
        for text in t.column("text").to_pylist():
            counts.update(text.split(" "))
        expected = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
        got = list(zip(df["tok"], df["n"]))
        assert sorted(got, key=lambda kv: (-kv[1], kv[0])) == expected

    def test_repetition_stats_matches_local(self, ray_session):
        from collections import Counter

        import pyarrow.parquet as pq

        from kgx.textops import repetition_stats

        df = repetition_stats(SF).to_pandas().set_index("doc_id")
        assert len(df) == 500
        t = pq.read_table("%s/documents.parquet" % SF,
                          columns=["doc_id", "text"])
        for doc_id, text in zip(t.column("doc_id").to_pylist()[:30],
                                t.column("text").to_pylist()[:30]):
            toks = text.split(" ")
            grams = Counter(zip(toks, toks[1:]))
            assert df.loc[doc_id, "n_2grams"] == sum(grams.values())
            assert df.loc[doc_id, "n_uniq_2grams"] == len(grams)
            assert df.loc[doc_id, "top_2gram_n"] == max(grams.values())

    def test_pii_scrub_redacts_injected_emails(self, ray_session):
        from kgx.textops import pii_scrub

        df = pii_scrub(SF).to_pandas().set_index("doc_id")
        assert len(df) == 500
        for doc_id, row in df.iterrows():
            want = (1 if doc_id % 5 == 0 else 0) + (1 if doc_id % 7 == 0 else 0)
            assert row["n_emails"] == want, doc_id
            assert "@" not in row["scrubbed"]
            assert row["scrubbed"].count("<EMAIL>") == want

    def test_tfidf_keywords_matches_local(self, ray_session):
        from collections import Counter

        import pyarrow.parquet as pq

        from kgx.textops import _LM_Q, tfidf_keywords

        out = tfidf_keywords(SF, k=3).to_pandas()
        assert set(out["rk"]) == {1, 2, 3}
        t = pq.read_table("%s/documents.parquet" % SF,
                          columns=["doc_id", "text"])
        texts = dict(zip(t.column("doc_id").to_pylist(),
                         t.column("text").to_pylist()))
        dfreq: Counter = Counter()
        for text in texts.values():
            dfreq.update(set(text.split(" ")))
        n = len(texts)
        got = {d: list(zip(g.sort_values("rk")["tok"],
                           g.sort_values("rk")["score_q"]))
               for d, g in out.groupby("doc_id")}
        for doc_id in list(texts)[:40]:
            tf = Counter(texts[doc_id].split(" "))
            want = sorted(((c * ((n * _LM_Q) // dfreq[w]), w)
                           for w, c in tf.items()),
                          key=lambda sw: (-sw[0], sw[1]))[:3]
            assert got[doc_id] == [(w, s) for s, w in want], doc_id

    def test_dup_ngram_stats_matches_local(self, ray_session):
        from collections import Counter

        import pyarrow.parquet as pq

        from kgx.textops import dup_ngram_stats

        L = 8
        df = dup_ngram_stats(SF, l=L).to_pandas().set_index("doc_id")
        assert len(df) == 500
        t = pq.read_table("%s/documents.parquet" % SF,
                          columns=["doc_id", "text"])
        texts = dict(zip(t.column("doc_id").to_pylist(),
                         t.column("text").to_pylist()))
        occ: Counter = Counter()
        wins = {}
        for doc_id, text in texts.items():
            toks = text.split(" ")
            ws = [" ".join(toks[i:i + L]) for i in range(len(toks) - L + 1)]
            wins[doc_id] = ws
            occ.update(ws)
        assert occ and max(occ.values()) >= 2  # signal is non-trivial
        for doc_id, ws in wins.items():
            assert df.loc[doc_id, "n_windows"] == len(ws)
            assert df.loc[doc_id, "n_dup_positions"] == sum(
                1 for w in ws if occ[w] >= 2)

    def test_unigram_lm_score_matches_local(self, ray_session):
        from collections import Counter

        import pyarrow.parquet as pq

        from kgx.textops import _LM_Q, unigram_lm_score

        df = unigram_lm_score(SF).to_pandas().set_index("doc_id")
        assert len(df) == 500
        t = pq.read_table("%s/documents.parquet" % SF,
                          columns=["doc_id", "text"])
        texts = dict(zip(t.column("doc_id").to_pylist(),
                         t.column("text").to_pylist()))
        counts = Counter()
        for text in texts.values():
            counts.update(text.split(" "))
        total = sum(counts.values())
        for doc_id in list(texts)[:30]:
            toks = texts[doc_id].split(" ")
            want = sum((counts[x] * _LM_Q) // total for x in toks)
            assert df.loc[doc_id, "lm_q20"] == want
            assert df.loc[doc_id, "n_tokens"] == len(toks)


    def test_bigram_lm_score_matches_local_replay(self, ray_session):
        import math
        from collections import Counter

        import pyarrow.parquet as pq

        from kgx.textops import bigram_lm_score

        df = bigram_lm_score(SF).to_pandas().set_index("doc_id")
        assert len(df) == 500
        t = pq.read_table("%s/documents.parquet" % SF,
                          columns=["doc_id", "text"])
        texts = dict(zip(t.column("doc_id").to_pylist(),
                         t.column("text").to_pylist()))
        uni, cvw, cv = Counter(), Counter(), Counter()
        for text in texts.values():
            toks = text.split(" ")
            uni.update(toks)
            cvw.update(zip(toks, toks[1:]))
            cv.update(toks[:-1])
        T = float(sum(uni.values()))
        for doc_id in list(texts)[:20]:
            toks = texts[doc_id].split(" ")
            want = sum(
                math.floor(1048576.0 * math.log(
                    0.75 * (float(cvw[(v, w)]) / float(cv[v]))
                    + 0.25 * (float(uni[w]) / T)))
                for v, w in zip(toks, toks[1:]))
            assert df.loc[doc_id, "lm2_q20"] == want
            assert df.loc[doc_id, "n_bigrams"] == max(0, len(toks) - 1)

    def test_kn_bigram_score_matches_local_replay(self, ray_session):
        import math
        from collections import Counter

        import pyarrow.parquet as pq

        from kgx.textops import kn_bigram_score

        df = kn_bigram_score(SF).to_pandas().set_index("doc_id")
        assert len(df) == 500
        t = pq.read_table("%s/documents.parquet" % SF,
                          columns=["doc_id", "text"])
        texts = dict(zip(t.column("doc_id").to_pylist(),
                         t.column("text").to_pylist()))
        cvw, cv = Counter(), Counter()
        succ, pred = {}, {}
        for text in texts.values():
            toks = text.split(" ")
            for v, w in zip(toks, toks[1:]):
                cvw[(v, w)] += 1
                cv[v] += 1
                succ.setdefault(v, set()).add(w)
                pred.setdefault(w, set()).add(v)
        tot = float(len(cvw))
        for doc_id in list(texts)[:20]:
            toks = texts[doc_id].split(" ")
            want = sum(
                math.floor(1048576.0 * math.log(
                    max(float(cvw[(v, w)]) - 0.75, 0.0) / float(cv[v])
                    + ((0.75 * float(len(succ[v]))) / float(cv[v]))
                    * (float(len(pred[w])) / tot)))
                for v, w in zip(toks, toks[1:]))
            assert df.loc[doc_id, "kn_q20"] == want
            assert df.loc[doc_id, "n_bigrams"] == max(0, len(toks) - 1)
        # a proper probability: ln(P_KN) <= 0 term-wise
        assert (df["kn_q20"] <= 0).all()


class TestTailIndexGuards:
    def _corpus(self, tmp_path, n_chars_values):
        import pyarrow as pa
        import pyarrow.parquet as pq

        p = tmp_path / "docs"
        p.mkdir()
        pq.write_table(
            pa.table({
                "doc_id": pa.array(range(len(n_chars_values)),
                                   pa.int64()),
                "n_chars": pa.array(n_chars_values, pa.int64())}),
            str(p / "documents.parquet"))
        return str(p)

    def test_too_few_docs_raises_named_precondition(self, ray_session,
                                                    tmp_path):
        from kgx.textops import tail_index_hill

        sf = self._corpus(tmp_path, [100, 200, 300])
        with pytest.raises(AssertionError, match="needs > k"):
            tail_index_hill(sf, k=10)

    def test_flat_tail_raises_degenerate(self, ray_session, tmp_path):
        from kgx.textops import tail_index_hill

        sf = self._corpus(tmp_path, [500] * 30)
        with pytest.raises(AssertionError, match="degenerate tail"):
            tail_index_hill(sf, k=10)


class TestHarmonicCentrality:
    def test_local_replay(self, ray_session):
        # (bfs_levels' own local/distributed parity is pinned in its
        # tests; forcing the distributed loop here pays 4 sources ×
        # ~10 rounds × 2 shuffles of pure orchestration for no extra
        # coverage)
        import pyarrow.parquet as pq
        from collections import deque

        from kgx.components import harmonic_centrality

        got = harmonic_centrality(SF).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        n = pq.read_metadata("%s/documents.parquet" % SF).num_rows
        adj: dict = {}
        for v in range(n):
            if v > 0:
                adj.setdefault(v, set()).add(v // 2)
            adj.setdefault(v, set()).add((v * v + 1) % n)
        want = np.zeros(n, dtype=np.int64)
        for s in (0, 1, 2, 3):
            dd = {s: 0}
            q = deque([s])
            while q:
                u = q.popleft()
                for w in adj.get(u, ()):
                    if w not in dd:
                        dd[w] = dd[u] + 1
                        q.append(w)
            for v, d in dd.items():
                if d > 0:
                    want[v] += (1 << 20) // d
        assert got["harm_q20"].tolist() == want.tolist()
        # central nodes (near the tree root) dominate the periphery
        assert got.loc[0, "harm_q20"] > got["harm_q20"].median()


class TestPersonalizedPagerank:
    def test_local_vs_distributed_and_reachability_law(self,
                                                      ray_session):
        import pyarrow.parquet as pq
        import ray.data

        from kgx.components import pagerank_ranks, personalized_pagerank

        n = pq.read_metadata("%s/documents.parquet" % SF).num_rows
        seeds = np.arange(0, n, 101, dtype=np.int64)

        def edges_df():
            ids = np.arange(n, dtype=np.int64)
            tree = pd.DataFrame({"src": ids[ids > 0],
                                 "dst": ids[ids > 0] // 2})
            scat = pd.DataFrame({"src": ids, "dst": (ids * ids + 1) % n})
            return pd.concat([tree, scat]).drop_duplicates() \
                .reset_index(drop=True)

        local = pagerank_ranks(ray.data.from_pandas(edges_df()), n,
                               seeds=seeds).to_pandas() \
            .sort_values("node").reset_index(drop=True)
        dist = pagerank_ranks(ray.data.from_pandas(edges_df()), n,
                              seeds=seeds,
                              small_graph_threshold=0).to_pandas() \
            .sort_values("node").reset_index(drop=True)
        pd.testing.assert_frame_equal(local, dist)
        # the public op is the local path over the same edges
        got = personalized_pagerank(SF).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        assert got["ppr_q"].tolist() == local["rank_q"].tolist()
        # restart-locality law: positive mass only on nodes reachable
        # from a seed within the iteration budget; every seed positive
        e = edges_df()
        adj: dict = {}
        for s, d in zip(e["src"], e["dst"]):
            adj.setdefault(int(s), []).append(int(d))
        reach = set(int(x) for x in seeds)
        frontier = set(reach)
        for _ in range(8):
            nxt = {d for v in frontier for d in adj.get(v, [])}
            frontier = nxt - reach
            reach |= nxt
        pos = set(got.loc[got["ppr_q"] > 0, "doc_id"].astype(int))
        assert pos <= reach
        assert set(int(x) for x in seeds) <= pos
        assert len(pos) < n  # personalization is real: not all nodes


class TestWeightedReservoir:
    def test_aes_matches_local_replay(self, ray_session):
        import math

        import pyarrow.parquet as pq

        from kgx.traindata import _md5_u64, weighted_reservoir_sample

        got = weighted_reservoir_sample(SF).to_pandas()
        t = pq.read_table("%s/documents.parquet" % SF,
                          columns=["doc_id", "source", "n_chars"]) \
            .to_pandas()
        t["key"] = [
            math.log((float(_md5_u64(str(int(d)))) + 1.0)
                     / 18446744073709551616.0) / float(w)
            for d, w in zip(t["doc_id"], t["n_chars"])]
        for src, g in t.groupby("source"):
            want = g.sort_values(["key", "doc_id"],
                                 ascending=[False, True]).head(5)
            mine = got[got["source"] == src].sort_values("rank")
            assert mine["doc_id"].tolist() \
                == want["doc_id"].astype(int).tolist()
        # every source contributes exactly k winners
        assert got.groupby("source").size().eq(5).all()


def _write_neardup_corpus(path, n_docs, skewed, L=50):
    """Synthetic near-dup corpora for the skew kill-test.

    uniform: n/2 clusters of exactly 2 near-identical docs, disjoint
    vocabularies — many tiny components.
    skewed:  n/2 docs are L-token sliding windows of ONE token stream
    (consecutive windows share L-1 tokens → every link J=(L-1)/(L+1)
    ≈ 0.96 ≥ 0.8), chaining into a single giant component that holds
    ~all near-dup pairs; the other n/2 docs are vocabulary-disjoint
    singletons."""
    import os
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path)
    texts, ids = [], []
    if skewed:
        stream = ["c%d" % i for i in range(n_docs // 2 + L)]
        for i in range(n_docs // 2):
            ids.append(i)
            texts.append(" ".join(stream[i:i + L]))
        for i in range(n_docs // 2, n_docs):
            ids.append(i)
            texts.append(" ".join("s%d_%d" % (i, j) for j in range(L)))
    else:
        for i in range(n_docs // 2):
            base = ["u%d_%d" % (i, j) for j in range(L)]
            ids.append(2 * i)
            texts.append(" ".join(base))
            mut = list(base)
            mut[7] = "m%d" % i
            ids.append(2 * i + 1)
            texts.append(" ".join(mut))
    pq.write_table(pa.table({"doc_id": pa.array(ids, pa.int64()),
                             "text": pa.array(texts, pa.string())}),
                   os.path.join(path, "documents.parquet"))


class TestSkewKill:
    def test_giant_component_within_2x_of_uniform(self, ray_session):
        """One template family holding ~all near-dup pairs (one giant
        chained component) must not blow up the LSH→union-find→anti-join
        chain: wall stays within 2x of a uniform many-tiny-clusters
        corpus of the same size, and the giant component collapses to
        exactly one survivor. (BASELINE.md records the 32-CPU
        measurement at 10x this size.)"""
        import time

        from kgx.dedup import near_dup_dedup

        n = 6000
        walls = {}
        survivors = {}
        for name, skew in (("uniform", False), ("skew", True)):
            p = "/tmp/kgx_skewtest_%s" % name
            _write_neardup_corpus(p, n, skew)
            t0 = time.time()
            survivors[name] = len(near_dup_dedup(p, use_lsh=True)
                                  .to_pandas())
            walls[name] = time.time() - t0
        # uniform: every 2-cluster keeps its min → exactly n/2 survive
        assert survivors["uniform"] == n // 2
        # skew: n/2 singletons + ONE survivor of the giant component
        # (a handful of chain links may miss under minhash estimation)
        assert n // 2 + 1 <= survivors["skew"] <= n // 2 + 10
        assert walls["skew"] <= 2.0 * max(walls["uniform"], 1.0)

    def test_distributed_union_find_path_graph_skew(self, ray_session):
        """The distributed union-find itself (forced past the local
        gate) on the two adversarial shapes: a 60k-node PATH (maximum
        diameter — the giant chained dup family) must converge in
        O(log n) pointer-jumping rounds, never O(diameter); 30k
        disjoint 2-cliques pin the constant. Labels exact on both."""
        import math

        import pandas as pd
        import ray.data

        from kgx.components import connected_components

        n = 60_000
        path_edges = pd.DataFrame({
            "a": pd.Series(range(n - 1), dtype="int64"),
            "b": pd.Series(range(1, n), dtype="int64")})
        clique_edges = pd.DataFrame({
            "a": pd.Series(range(0, n, 2), dtype="int64"),
            "b": pd.Series(range(1, n, 2), dtype="int64")})
        rounds = {}
        for name, e in (("cliques", clique_edges), ("path", path_edges)):
            ds = ray.data.from_pandas(e)
            comp = connected_components(
                ds, small_graph_threshold=0).to_pandas()
            rounds[name] = connected_components.last_rounds
            if name == "path":
                assert (comp["component"] == 0).all()
                assert comp["node"].nunique() == n
            else:
                got = comp.sort_values("node").reset_index(drop=True)
                assert (got["component"].to_numpy()
                        == (got["node"].to_numpy() // 2 * 2)).all()
        # cliques: min propagates in one round (+1 to detect fixpoint);
        # path: label-of-label halves the chase distance each round →
        # ceil(log2 n) + slack, NEVER the 60k rounds of naive min-hop
        assert rounds["cliques"] <= 3
        assert rounds["path"] <= math.ceil(math.log2(n)) + 3


class TestCompressionRatio:
    def test_replay_and_signal_direction(self, ray_session):
        import zlib as _z

        import duckdb

        from kgx.textops import compression_ratio

        got = compression_ratio(SF).to_pandas().sort_values(
            "doc_id").reset_index(drop=True)
        docs = duckdb.sql(
            "SELECT doc_id, text FROM read_parquet("
            "'%s/documents.parquet') ORDER BY doc_id" % SF).df()
        assert len(got) == len(docs)
        for i in range(0, len(docs), 97):  # spot replay
            b = docs["text"].iloc[i].encode("utf-8")
            r = got.iloc[i]
            assert int(r["n_bytes"]) == len(b)
            assert int(r["n_compressed"]) == len(_z.compress(b, 6))
            assert int(r["ratio_ppm"]) == (1_000_000
                                           * int(r["n_compressed"])
                                           ) // len(b)
        # signal direction: a pure-repetition doc compresses far below
        # the corpus median
        rep = len(_z.compress(b"spam ham " * 60, 6))
        assert 1_000_000 * rep // 540 < got["ratio_ppm"].median()


class TestDedup:
    def test_exact_survivors(self, ray_session):
        from kgx.dedup import dedup_exact

        df = dedup_exact(SF).to_pandas()
        assert len(df) == 500  # no exact dups in testdata → all survive

    def test_first3_blocks(self, ray_session):
        from kgx.dedup import dedup_first3

        df = dedup_first3(SF).to_pandas()
        assert 0 < len(df) <= 500

    def test_near_dup_dedup_matches_duckdb_components(self, ray_session):
        # survivors == DuckDB's recursive-CTE connected-components answer
        import duckdb

        from kgx.dedup import near_dup_dedup
        from kgx.queries import DOC_ORACLES

        surv = set(near_dup_dedup(SF).to_pandas()["doc_id"])
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            "read_parquet('%s/documents.parquet')" % SF)
        expected = set(con.execute(DOC_ORACLES["near_dup_dedup"]).df()["doc_id"])
        con.close()
        assert surv == expected
        assert 0 < len(surv) <= 500

    def test_near_dup_dedup_no_pairs_everything_survives(self, ray_session):
        from kgx.dedup import near_dup_dedup

        # threshold above 1.0 → provably zero pairs → empty-edge path
        df = near_dup_dedup(SF, threshold=1.01).to_pandas()
        assert len(df) == 500

    def test_near_dup_dedup_lsh_merges_at_least_the_blocked_pairs(
            self, ray_session):
        # the LSH pair stage sees EVERY high-Jaccard pair (no first-token
        # blocking), so it merges strictly more than the blocked exact
        # stage: its survivor set must be (almost) a subset — the slack
        # is the LSH recall miss rate (~0.5% of edges at this scale)
        from kgx.dedup import near_dup_dedup

        exact = set(near_dup_dedup(SF).to_pandas()["doc_id"])
        approx = set(near_dup_dedup(SF, use_lsh=True).to_pandas()["doc_id"])
        # one-directional with the same tolerance as the set-difference
        # check: MinHash verify (64 perms) may miss a blocked pair that no
        # cross-block merge compensates, yielding a few MORE LSH survivors
        slack = max(2, int(len(exact) * 0.02))
        assert len(approx) <= len(exact) + slack
        assert len(approx - exact) <= slack

    def test_jaccard_escalated_block_matches_exact(self):
        # unit: the LSH-candidate + exact-verify path returns the same
        # pairs as brute force on a block with clear cluster structure
        from kgx.dedup import _block_pairs_escalated, _block_pairs_exact

        ids, sets = [], []
        for c in range(40):  # 40 clusters of 3 near-identical docs
            vocab = {"c%d_w%d" % (c, w) for w in range(30)}
            for m in range(3):
                ids.append(c * 3 + m)
                sets.append(vocab | {"c%d_extra%d" % (c, m)})
        exact = _block_pairs_exact(ids, sets, 0.8)
        esc = _block_pairs_escalated(ids, sets, 0.8)
        assert sorted(exact) == esc
        assert len(esc) == 40 * 3  # 3 pairs per cluster

    def test_jaccard_pairs_block_cap_preserves_answer(self, ray_session,
                                                      tmp_path):
        # a hyper-common first token puts every doc in ONE block; with
        # block_cap far below the block size the escalated path must
        # still produce the exact answer on well-separated clusters
        import pandas as pd

        from kgx.dedup import jaccard_pairs

        rows = []
        for c in range(60):
            body = " ".join("c%d_w%d" % (c, w) for w in range(25))
            for m in range(2):
                rows.append({"doc_id": c * 2 + m,
                             "text": "zz %s extra%d" % (body, m)})
        corpus = tmp_path / "skew"
        corpus.mkdir()
        pd.DataFrame(rows).to_parquet(corpus / "documents.parquet")

        capped = jaccard_pairs(str(corpus), block_cap=16).to_pandas()
        exact = jaccard_pairs(str(corpus), block_cap=None).to_pandas()
        key = ["doc_id_a", "doc_id_b"]
        a = capped.sort_values(key).reset_index(drop=True)
        b = exact.sort_values(key).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)
        assert len(a) == 60  # one pair per cluster

    def test_lsh_band_regime_derivation(self):
        from kgx.dedup import lsh_bands_for_threshold

        assert lsh_bands_for_threshold(0.5) == 16   # knee 0.50
        assert lsh_bands_for_threshold(0.8) == 8    # knee 0.77
        assert lsh_bands_for_threshold(0.95) == 4   # knee 0.917
        assert lsh_bands_for_threshold(0.2) == 32   # knee 0.177
        assert lsh_bands_for_threshold(0.1) == 32   # floor

    def test_embedding_lsh_recall_vs_exact(self, ray_session):
        # the LSH scale path: precision must be 1.0 (exact within-bucket
        # verify), recall bounded below vs the exact block-grid answer
        from kgx.dedup import embedding_near_dup, embedding_near_dup_lsh

        exact = embedding_near_dup(SF).to_pandas()
        approx = embedding_near_dup_lsh(SF).to_pandas()
        truth = set(zip(exact.vec_id_a, exact.vec_id_b))
        got = set(zip(approx.vec_id_a, approx.vec_id_b))
        assert got <= truth  # precision 1.0
        recall = len(got & truth) / len(truth)
        assert recall >= 0.85, recall

    def test_minhash_agrees_with_true_jaccard(self, ray_session):
        # every LSH pair with est >= 0.7 must be a true-Jaccard >= 0.5 pair
        from kgx.dedup import minhash_lsh_pairs

        import pyarrow.parquet as pq

        pairs = minhash_lsh_pairs(SF, threshold=0.7).to_pandas()
        t = pq.read_table("%s/documents.parquet" % SF, columns=["doc_id", "text"])
        texts = dict(zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()))

        def true_jaccard(a, b):
            def sh(x):
                toks = x.split(" ")
                return {" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)}
            sa, sb = sh(texts[a]), sh(texts[b])
            return len(sa & sb) / len(sa | sb)

        for row in pairs.itertuples(index=False):
            assert true_jaccard(row.doc_id_a, row.doc_id_b) >= 0.4, row

    def test_lsh_verify_plans_identical(self, ray_session):
        # carry (sig ships with the band row, 2 exchanges) and join
        # (sig hash-joined back onto candidate pairs, 4 exchanges) are
        # alternative PLANS of the same operator: bit-identical buckets
        # (both hash the hex band slice), so the pair set and every
        # estimate must agree exactly
        from kgx.dedup import minhash_lsh_pairs

        def key(df):
            return set(zip(df.doc_id_a, df.doc_id_b, df.jaccard_est))

        for kw in ({}, {"threshold": 0.8, "shingle_k": 1}):
            carry = minhash_lsh_pairs(SF, **kw).to_pandas()
            join = minhash_lsh_pairs(SF, verify="join", **kw).to_pandas()
            filt = minhash_lsh_pairs(SF, verify="carry_filtered",
                                     **kw).to_pandas()
            assert key(carry) == key(join)
            # the singleton-bucket pre-filter drops only rows that can
            # never pair: identical output, fewer shipped bytes
            assert key(carry) == key(filt)
            assert len(carry) > 0  # non-vacuous

    def test_lsh_carry_filtered_hot_cap_fallback(self, ray_session):
        # hot_cap=0 forces the dup-heavy fallback: the plan must route
        # to verify="join" and still return the identical pair set
        from kgx.dedup import (_lsh_pairs_carry_filtered,
                               lsh_bands_for_threshold,
                               minhash_lsh_pairs)

        bands = lsh_bands_for_threshold(0.5, 64)
        got = _lsh_pairs_carry_filtered(
            SF, 64, bands, 64 // bands, 0.5, 8, 3, 200,
            hot_cap=0).to_pandas()
        want = minhash_lsh_pairs(SF, verify="join",
                                 num_partitions=8).to_pandas()
        assert set(zip(got.doc_id_a, got.doc_id_b)) \
            == set(zip(want.doc_id_a, want.doc_id_b))

    def test_simhash_close_docs_close_hashes(self, ray_session):
        from kgx.dedup import simhash

        df = simhash(SF).to_pandas()
        assert len(df) == 500
        assert df["simhash"].str.len().eq(16).all()

    def test_simhash_pairs_brute_force_replay(self, ray_session):
        # pigeonhole completeness: the banded engine finds EXACTLY the
        # all-pairs hamming<=3 set, each pair once
        from kgx.dedup import simhash, simhash_pairs

        sh = simhash(SF).to_pandas()
        vals = {int(r.doc_id): int(r.simhash, 16)
                for r in sh.itertuples()}
        ids = sorted(vals)
        want = {}
        for i, a in enumerate(ids):
            for b in ids[i + 1:]:
                h = bin(vals[a] ^ vals[b]).count("1")
                if h <= 3:
                    want[(a, b)] = h
        got = simhash_pairs(SF).to_pandas()
        assert len(got) == len(got.drop_duplicates(["doc_id_a",
                                                    "doc_id_b"]))
        got_d = {(int(r.doc_id_a), int(r.doc_id_b)): int(r.hamming)
                 for r in got.itertuples()}
        assert got_d == want
        assert len(want) > 0  # non-vacuous at sf0.001

    def test_cdc_chunks_lossless_partition(self, ray_session):
        import duckdb

        from kgx.dedup import cdc_chunks

        got = cdc_chunks(SF).to_pandas()
        lens = duckdb.sql(
            "SELECT doc_id, len(string_split(text, ' ')) AS n"
            " FROM read_parquet('%s/documents.parquet')" % SF).df()
        # spans partition [0, n_tokens) exactly, in order
        per_doc = got.sort_values(["doc_id", "chunk_idx"]).groupby("doc_id")
        n_by_doc = dict(zip(lens["doc_id"].astype(int),
                            lens["n"].astype(int)))
        for doc_id, g in per_doc:
            starts = g["start_tok"].to_numpy()
            ns = g["n_tokens"].to_numpy()
            assert starts[0] == 0
            assert (starts[1:] == (starts + ns)[:-1]).all()
            assert starts[-1] + ns[-1] == n_by_doc[int(doc_id)]
            assert (g["chunk_idx"].to_numpy()
                    == np.arange(len(g))).all()

    def test_cdc_realigns_after_insertion(self):
        # the property fixed-size segmentation lacks: prepending tokens
        # shifts every 16-token segment, but CDC chunks re-synchronize
        # at the next content boundary
        from kgx.dedup import _cdc_split

        base = ["tok%d" % i for i in range(200)]
        spans_a = _cdc_split(base, 16)
        shifted = ["inserted", "prefix"] + base
        spans_b = _cdc_split(shifted, 16)
        chunks_a = {" ".join(base[s:s + n]) for s, n in spans_a}
        chunks_b = {" ".join(shifted[s:s + n]) for s, n in spans_b}
        shared = chunks_a & chunks_b
        # everything after the first boundary is identical content
        assert len(shared) >= len(spans_a) - 1
        assert len(spans_a) > 3  # non-vacuous: real boundaries exist

    def test_ssjoin_prefix_complete_vs_blocked_jaccard(self, ray_session):
        # the prefix join is COMPLETE: it contains every pair the
        # first-token-blocked exact stage finds (plus cross-block ones)
        from kgx.dedup import jaccard_pairs, ssjoin_prefix

        full = ssjoin_prefix(SF).to_pandas()
        blocked = jaccard_pairs(SF).to_pandas()
        fset = set(map(tuple, full[["doc_id_a", "doc_id_b"]].values))
        bset = set(map(tuple,
                       blocked[["doc_id_a", "doc_id_b"]].values))
        assert bset <= fset
        assert len(fset) > len(bset)  # cross-block pairs really exist
        # exactly-once emission
        assert len(full) == len(full.drop_duplicates(["doc_id_a",
                                                      "doc_id_b"]))

    def test_ssjoin_bitset_matches_general_path(self, ray_session):
        from kgx.dedup import ssjoin_prefix

        key = lambda df: set(map(tuple, df[["doc_id_a", "doc_id_b",
                                            "sim_q"]].values))
        fast = ssjoin_prefix(SF).to_pandas()  # ≤63-vocab bitset path
        gen = ssjoin_prefix(SF, force_general=True).to_pandas()
        assert key(fast) == key(gen)
        assert len(fast) == len(gen)

    def test_ssjoin_banded_matches_dict_path(self, ray_session):
        # the 10^9-vocab rank path (no driver {token: rank} dict) is
        # pinned pair-identical to the broadcast-dict path, including
        # with cells forced tiny so multi-cell bands really occur
        from kgx.dedup import ssjoin_prefix

        key = lambda df: sorted(map(tuple, df[["doc_id_a", "doc_id_b",
                                               "sim_q"]].values))
        gen = ssjoin_prefix(SF, force_general=True).to_pandas()
        band = ssjoin_prefix(SF, force_banded=True).to_pandas()
        tiny = ssjoin_prefix(SF, force_banded=True,
                             cell_target=4).to_pandas()
        assert key(band) == key(gen)
        assert key(tiny) == key(gen)

    def test_ssjoin_banded_large_vocab_brute_force(self, ray_session):
        # a corpus whose vocabulary (~1200 tokens) spreads over many
        # (df-band, hash-cell) cells: banded ranks vs brute-force truth
        import ray.data

        from kgx.dedup import _ssjoin_prefix_ds

        rows = []
        for i in range(120):
            base = ["w%d" % ((i * 7 + j) % 1100) for j in range(24)]
            rows.append((2 * i, " ".join(base)))
            # near-dup partner: one token substituted → J = 23/25
            mut = list(base)
            mut[5] = "x%d" % i
            rows.append((2 * i + 1, " ".join(mut)))
        import pandas as pd

        docs = pd.DataFrame(rows, columns=["doc_id", "text"])
        ds = ray.data.from_pandas(docs)
        got = _ssjoin_prefix_ds(ds, force_banded=True,
                                cell_target=64).to_pandas()
        sets = {int(i): set(t.split(" "))
                for i, t in zip(docs["doc_id"], docs["text"])}
        ids = sorted(sets)
        want = {}
        for ii, a in enumerate(ids):
            for b in ids[ii + 1:]:
                inter = len(sets[a] & sets[b])
                union = len(sets[a]) + len(sets[b]) - inter
                if 5 * inter >= 4 * union:
                    want[(a, b)] = ((1 << 20) * inter) // union
        got_d = {(int(r.doc_id_a), int(r.doc_id_b)): int(r.sim_q)
                 for r in got.itertuples()}
        assert got_d == want
        assert len(want) >= 120  # every mutated pair qualifies

    def test_ssjoin_prefix_brute_force_replay(self, ray_session):
        import duckdb

        from kgx.dedup import ssjoin_prefix

        got = ssjoin_prefix(SF).to_pandas()
        docs = duckdb.sql(
            "SELECT doc_id, text FROM read_parquet('%s/documents.parquet')"
            % SF).df()
        sets = {int(i): set(t.split(" "))
                for i, t in zip(docs["doc_id"], docs["text"])}
        ids = sorted(sets)
        want = {}
        for i, a in enumerate(ids):
            for b in ids[i + 1:]:
                inter = len(sets[a] & sets[b])
                union = len(sets[a]) + len(sets[b]) - inter
                if 5 * inter >= 4 * union:
                    want[(a, b)] = ((1 << 20) * inter) // union
        got_d = {(int(r.doc_id_a), int(r.doc_id_b)): int(r.sim_q)
                 for r in got.itertuples()}
        assert got_d == want

    def test_simhash_pairs_partition_invariant(self, ray_session):
        from kgx.dedup import simhash_pairs

        key = lambda df: set(map(tuple, df[["doc_id_a", "doc_id_b",
                                            "hamming"]].values))
        a = simhash_pairs(SF).to_pandas()
        b = simhash_pairs(SF, num_partitions=64).to_pandas()
        assert key(a) == key(b)


class TestSimSearch:
    def test_ivf_recall_vs_bruteforce(self, ray_session):
        from kgx.simsearch import knn_bruteforce, knn_ivf

        bf = knn_bruteforce(SF).to_pandas()
        ivf = knn_ivf(SF)  # small-table gate returns pandas
        ivf = ivf.to_pandas() if hasattr(ivf, "to_pandas") else ivf
        bf_sets = bf.groupby("query_id")["neighbor_id"].apply(set)
        ivf_sets = ivf.groupby("query_id")["neighbor_id"].apply(set)
        recalls = [
            len(bf_sets[q] & ivf_sets.get(q, set())) / len(bf_sets[q])
            for q in bf_sets.index
        ]
        # trained 64-centroid IVF probing nprobe=16/64 buckets (~25% of
        # the data) — measured 0.78 at sf0.001, 0.88 at sf0.01
        assert np.mean(recalls) >= 0.7, np.mean(recalls)

    def test_knn_graph_matches_bruteforce_on_query_subset(self, ray_session):
        # the all-pairs graph restricted to knn_bruteforce's stride-50
        # query subset must BE knn_bruteforce's answer (same tie rule,
        # same k) — pins the block-grid partial-top-k + reduce against
        # the independently-oracled baseline
        import pandas as pd

        from kgx.simsearch import knn_bruteforce, knn_graph

        bf = (knn_bruteforce(SF).to_pandas()
              .sort_values(["query_id", "rank"]).reset_index(drop=True))
        g = knn_graph(SF).to_pandas()
        sub = (g[g["vec_id"] % 50 == 0]
               .sort_values(["vec_id", "rank"]).reset_index(drop=True)
               .rename(columns={"vec_id": "query_id"}))
        pd.testing.assert_frame_equal(
            sub[["query_id", "neighbor_id", "rank"]],
            bf[["query_id", "neighbor_id", "rank"]])

    def test_knn_graph_every_vector_is_a_query(self, ray_session):
        import pyarrow.parquet as pq

        from kgx.simsearch import knn_graph

        n = pq.ParquetFile(SF + "/embeddings.parquet").metadata.num_rows
        g = knn_graph(SF, k=3).to_pandas()
        assert g["vec_id"].nunique() == n
        assert (g.groupby("vec_id")["rank"].max() == 3).all()
        # block-grid independence: a different grid, identical answer
        g2 = knn_graph(SF, k=3, num_blocks=5).to_pandas()
        cols = ["vec_id", "neighbor_id", "rank"]
        import pandas as pd
        pd.testing.assert_frame_equal(
            g[cols].sort_values(cols).reset_index(drop=True),
            g2[cols].sort_values(cols).reset_index(drop=True))

    def test_ivf_sharded_buckets_same_answer(self, ray_session):
        # bucket sub-sharding is a pure partitioning of candidates: the
        # per-query reduce merges shard partials to the identical top-k
        import pandas as pd

        from kgx.simsearch import knn_ivf

        base = knn_ivf(SF)
        base = base.to_pandas() if hasattr(base, "to_pandas") else base
        sharded = knn_ivf(SF, shards_per_bucket=4)
        sharded = (sharded.to_pandas()
                   if hasattr(sharded, "to_pandas") else sharded)
        cols = ["query_id", "neighbor_id", "rank"]
        a = base[cols].sort_values(cols).reset_index(drop=True)
        b = sharded[cols].sort_values(cols).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)

    def test_ivfpq_recall_vs_bruteforce(self, ray_session):
        from kgx.simsearch import knn_bruteforce, knn_ivfpq

        bf = knn_bruteforce(SF).to_pandas()
        pqr = knn_ivfpq(SF)  # small-table gate returns pandas
        pqr = pqr.to_pandas() if hasattr(pqr, "to_pandas") else pqr
        bf_sets = bf.groupby("query_id")["neighbor_id"].apply(set)
        pq_sets = pqr.groupby("query_id")["neighbor_id"].apply(set)
        recalls = [
            len(bf_sets[q] & pq_sets.get(q, set())) / len(bf_sets[q])
            for q in bf_sets.index
        ]
        # 8-bit residual PQ + exact refine recovers the full IVF routing
        # ceiling — measured 0.78 at sf0.001, identical to knn_ivf's
        assert np.mean(recalls) >= 0.7, np.mean(recalls)

    def test_ivfpq_sharded_buckets_same_answer(self, ray_session):
        import pandas as pd

        from kgx.simsearch import knn_ivfpq

        def _pd(x):
            return x.to_pandas() if hasattr(x, "to_pandas") else x

        base = _pd(knn_ivfpq(SF))
        sharded = _pd(knn_ivfpq(SF, shards_per_bucket=4))
        cols = ["query_id", "neighbor_id", "rank"]
        a = base[cols].sort_values(cols).reset_index(drop=True)
        b = sharded[cols].sort_values(cols).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)

    def test_bruteforce_rank_contract(self, ray_session):
        from kgx.simsearch import knn_bruteforce

        df = knn_bruteforce(SF).to_pandas()
        per_q = df.groupby("query_id")["rank"].apply(list)
        for ranks in per_q:
            assert sorted(ranks) == [1, 2, 3, 4, 5]


class TestAnnRecall:
    def test_recall_matches_set_intersection(self, ray_session):
        from kgx.simsearch import ann_recall, knn_bruteforce, knn_ivf

        got = ann_recall(SF).to_pandas().set_index("query_id")
        ivf = knn_ivf(SF)
        ivf = ivf.to_pandas() if hasattr(ivf, "to_pandas") else ivf
        ex = knn_bruteforce(SF)
        ex = ex.to_pandas() if hasattr(ex, "to_pandas") else ex
        for q in ex["query_id"].unique():
            a = set(ivf.loc[ivf["query_id"] == q, "neighbor_id"])
            b = set(ex.loc[ex["query_id"] == q, "neighbor_id"])
            assert int(got.loc[q, "n_hits"]) == len(a & b)
        assert (got["n_hits"].between(0, 5)).all()
        # the index is actually good on this corpus
        assert got["n_hits"].mean() >= 3.0
        assert (got["n_hits"] == 5).any()


class TestHnswSearch:
    def test_gate_matches_distributed_and_descent_laws(self,
                                                       ray_session):
        from kgx.simsearch import (_hnsw_level, hnsw_search,
                                   knn_greedy_search)

        got = hnsw_search(SF).sort_values(
            "query_id").reset_index(drop=True)
        dist = hnsw_search(SF, small_graph_threshold=0) \
            .sort_values("query_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, dist)
        assert len(got) == 10
        # descent laws: found != query; the final layer-0 walk runs on
        # the SAME graph as knn_greedy_search, so the hnsw result is a
        # local optimum there too — specifically, re-walking layer 0
        # FROM the hnsw result moves nowhere (fixpoint)
        assert (got["found_id"] != got["query_id"]).all()
        # layers thin geometrically-ish: strictly fewer members with
        # each level on this corpus
        import numpy as np

        import pyarrow.parquet as pq

        ids = np.asarray(pq.read_table(
            "%s/embeddings.parquet" % SF,
            columns=["vec_id"]).column("vec_id"))
        lv = _hnsw_level(ids)
        n0, n1, n2 = (lv >= 0).sum(), (lv >= 1).sum(), (lv >= 2).sum()
        assert n0 > n1 > n2 >= 2
        # a flat greedy walk from the fixed entry may land elsewhere —
        # the layered descent is a different (usually better) start;
        # both must be valid non-query nodes
        flat = knn_greedy_search(SF).set_index("query_id")
        assert set(got["query_id"]) == set(flat.index)

    def test_one_pass_layer_build_matches_per_layer_builds(
            self, ray_session):
        # knn_graph_layers shares ONE block-grid matmul across layers;
        # every layer's edge set must equal the standalone
        # knn_graph(level_at_least=l) build
        from kgx.simsearch import knn_graph, knn_graph_layers

        le = knn_graph_layers(SF).to_pandas()
        cols = ["vec_id", "neighbor_id", "rank"]
        for l in (0, 1, 2):
            a = le[le["layer"] == l][cols] \
                .sort_values(["vec_id", "rank"]).reset_index(drop=True)
            b = knn_graph(SF, level_at_least=l if l else None) \
                .to_pandas()[cols] \
                .sort_values(["vec_id", "rank"]).reset_index(drop=True)
            pd.testing.assert_frame_equal(a, b)
        assert (le.groupby("layer").size().sort_index(ascending=False)
                .is_monotonic_increasing)  # layers thin upward


class TestGreedySearch:
    def test_gate_matches_distributed_and_walk_laws(self, ray_session):
        import numpy as np

        from kgx.simsearch import knn_greedy_search, _normalize

        got = knn_greedy_search(SF).sort_values(
            "query_id").reset_index(drop=True)
        dist = knn_greedy_search(SF, small_graph_threshold=0) \
            .sort_values("query_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, dist)
        # walk laws: found != query, hop counts within the cap, and the
        # found node is a LOCAL optimum of the knn graph (no out-
        # neighbor beats it for its query) — the greedy contract
        import duckdb

        from kgx.simsearch import knn_graph

        e = knn_graph(SF).to_pandas()
        adj = {}
        for v, n in zip(e["vec_id"].astype(int),
                        e["neighbor_id"].astype(int)):
            adj.setdefault(v, []).append(n)
        emb = duckdb.sql(
            "SELECT vec_id, embedding FROM read_parquet("
            "'%s/embeddings.parquet') ORDER BY vec_id" % SF).df()
        M = _normalize(np.array(emb["embedding"].tolist(),
                                dtype=np.float64))
        row = {int(v): i for i, v in enumerate(emb["vec_id"])}
        for r in got.itertuples():
            q, f = int(r.query_id), int(r.found_id)
            assert f != q and 0 <= r.n_hops <= 12
            qe = M[row[q]]
            fsim = float(M[row[f]] @ qe)
            for nb in adj.get(f, []):
                if nb == q:
                    continue
                nsim = float(M[row[nb]] @ qe)
                assert (nsim, -nb) <= (fsim, -f)


class TestKmeans:
    def test_kmeans_clusters_matches_local_argmax(self, ray_session):
        import numpy as np
        import pyarrow.parquet as pq

        from kgx.simsearch import kmeans_clusters, train_centroids

        df = kmeans_clusters(SF).to_pandas().set_index("vec_id")["cluster"]
        t = pq.read_table("%s/embeddings.parquet" % SF,
                          columns=["vec_id", "embedding"])
        M = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
        C = train_centroids(SF)
        want = np.argmax(M @ C.T, axis=1)
        ids = t.column("vec_id").to_pylist()
        assert [int(df.loc[v]) for v in ids] == want.tolist()
        assert df.nunique() > 1  # the quantizer actually separates

    def test_semantic_dedup_prunes_and_matches_local(self, ray_session):
        import numpy as np
        import pyarrow.parquet as pq

        from kgx.dedup import semantic_dedup
        from kgx.simsearch import train_centroids

        threshold = 0.4
        out = semantic_dedup(SF, threshold=threshold).to_pandas()
        t = pq.read_table("%s/embeddings.parquet" % SF,
                          columns=["vec_id", "embedding"])
        ids = np.asarray(t.column("vec_id"))
        M = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
        C = train_centroids(SF)
        cluster = np.argmax(M @ C.T, axis=1)
        Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
        # local replay of the earlier-mate rule
        order = np.argsort(ids)
        keep = []
        for j in order:
            dup = False
            for i in order:
                if ids[i] >= ids[j]:
                    break
                if cluster[i] == cluster[j] and Mn[i] @ Mn[j] >= threshold:
                    dup = True
                    break
            if not dup:
                keep.append(int(ids[j]))
        assert sorted(out["vec_id"]) == sorted(keep)
        assert 0 < len(out) < len(ids)  # non-vacuous: some pruned, some kept

    def test_semantic_dedup_chunked_matmul_invariant(self, ray_session):
        # the column-chunked similarity blocks (the O(n_c·chunk)-memory
        # path that replaces the dense n_c² matrix) must be invisible:
        # a chunk small enough to force many block boundaries in every
        # cluster returns the identical survivor set
        from kgx.dedup import semantic_dedup

        base = semantic_dedup(SF).to_pandas().sort_values("vec_id")
        tiny = semantic_dedup(SF, chunk=3).to_pandas() \
            .sort_values("vec_id")
        assert base["vec_id"].tolist() == tiny["vec_id"].tolist()
        assert base["cluster"].tolist() == tiny["cluster"].tolist()


class TestEvents:
    def test_sessionize_bounds(self, ray_session):
        from kgx.events import sessionize

        df = sessionize(SF).to_pandas()
        assert (df["n_sessions"] >= 1).all()
        assert (df["n_sessions"] <= df["n_events"]).all()


class TestEventsExtra:
    def test_events_asof_matches_local(self, ray_session):
        import pandas as pd
        import pyarrow.parquet as pq

        from kgx.events import events_asof

        got = events_asof(SF).to_pandas().sort_values("event_id") \
            .reset_index(drop=True)
        ev = pq.read_table("%s/events.parquet" % SF).to_pandas()
        p = ev[ev["event_type"] == "purchase"]
        v = ev[ev["event_type"] == "view"]
        rows = []
        for r in p.itertuples(index=False):
            prior = v[(v["user_id"] == r.user_id) & (v["ts"] < r.ts)]
            if prior.empty:
                continue
            best = prior.loc[prior["ts"].idxmax()]
            rows.append((r.event_id, best["event_id"],
                         (r.ts - best["ts"]) // pd.Timedelta(microseconds=1)))
        expect = pd.DataFrame(rows, columns=["event_id", "asof_event_id",
                                             "gap_us"]) \
            .sort_values("event_id").reset_index(drop=True)
        assert got.astype("int64").equals(expect.astype("int64"))

    def test_sliding_window_counts_cover_events(self, ray_session):
        from kgx.events import sliding_window_counts

        df = sliding_window_counts(SF).to_pandas()
        # every event is in exactly 4 windows → total = 4 × 1000 events
        assert df["n"].sum() == 4 * 1000
        assert (df["window_start"] % 900 == 0).all()


    def test_ntile_buckets_pandas_replay(self, ray_session):
        import pyarrow.parquet as pq

        from kgx.textops import ntile_buckets

        got = (ntile_buckets(SF).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        docs = pq.read_table(
            "%s/documents.parquet" % SF,
            columns=["doc_id", "lang", "n_chars"]).to_pandas()
        docs = docs.sort_values(["lang", "n_chars", "doc_id"])
        docs["rn"] = docs.groupby("lang").cumcount() + 1
        n = docs.groupby("lang")["doc_id"].transform("size")
        size, rem = n // 4, n % 4
        big = docs["rn"] <= (size + 1) * rem
        docs["ntile4"] = np.where(
            big, (docs["rn"] - 1) // (size + 1) + 1,
            rem + (docs["rn"] - 1 - (size + 1) * rem) // size + 1)
        docs["cume_cnt"] = docs.groupby(["lang", "n_chars"])["rn"] \
            .transform("max")
        docs = docs.sort_values("doc_id").reset_index(drop=True)
        for col in ("rn", "ntile4", "cume_cnt"):
            assert (got[col].to_numpy("int64")
                    == docs[col].to_numpy("int64")).all(), col
        # quartiles are equi-height within each lang (±1)
        sizes = got.groupby(["lang", "ntile4"]).size()
        spread = sizes.groupby(level=0).agg(lambda s: s.max() - s.min())
        assert (spread <= 1).all()

    def test_debounce_sequential_replay(self, ray_session):
        import pyarrow.parquet as pq

        from kgx.events import debounce_events

        W = 1440 * 60_000_000
        got = debounce_events(SF).to_pandas()
        ev = pq.read_table("%s/events.parquet" % SF).to_pandas()
        ev["tus"] = ((ev["ts"] - pd.Timestamp(0))
                     // pd.Timedelta(microseconds=1)).astype("int64")
        want = {}
        for (_, _), g in ev.sort_values(["tus", "event_id"]).groupby(
                ["user_id", "event_type"]):
            last = None
            for r in g.itertuples(index=False):
                keep = last is None or r.tus - last >= W
                want[int(r.event_id)] = int(keep)
                if keep:
                    last = r.tus
        got_d = dict(zip(got["event_id"].astype(int),
                         got["kept"].astype(int)))
        assert got_d == want
        assert 0 < sum(want.values()) < len(want)  # non-vacuous

    def test_debounce_differs_from_lag_filter(self, ray_session):
        # the kept chain is stateful: inside a long burst a lag-based
        # filter (gap from previous EVENT) suppresses everything after
        # the first, but debounce re-admits one event per window
        import pyarrow.parquet as pq

        from kgx.events import debounce_events

        W = 1440 * 60_000_000
        got = debounce_events(SF).to_pandas()
        ev = pq.read_table("%s/events.parquet" % SF).to_pandas()
        ev["tus"] = ((ev["ts"] - pd.Timestamp(0))
                     // pd.Timedelta(microseconds=1)).astype("int64")
        ev = ev.sort_values(["user_id", "event_type", "tus", "event_id"])
        gap = ev.groupby(["user_id", "event_type"])["tus"].diff()
        lag_kept = (gap.isna() | (gap >= W)).astype(int)
        lag_d = dict(zip(ev["event_id"].astype(int), lag_kept))
        got_d = dict(zip(got["event_id"].astype(int),
                         got["kept"].astype(int)))
        # debounce keeps a superset of the lag filter, strictly more
        assert all(got_d[k] >= v for k, v in lag_d.items())
        assert sum(got_d.values()) > sum(lag_d.values())


class TestTrainData:
    def test_greedy_set_cover_replay(self, ray_session):
        # single-thread greedy replay — same tie rule, same gains
        import duckdb

        from kgx.traindata import greedy_set_cover

        got = greedy_set_cover(SF, k=5)
        docs = duckdb.sql(
            "SELECT doc_id, text FROM read_parquet('%s/documents.parquet')"
            " ORDER BY doc_id" % SF).df()
        sets = {}
        for i, t in zip(docs["doc_id"], docs["text"]):
            toks = t.split(" ")
            sets[int(i)] = {" ".join(toks[j:j + 3])
                            for j in range(len(toks) - 2)}
        covered, want = set(), []
        for rnd in range(1, 6):
            best = max(sorted(sets),
                       key=lambda d: (len(sets[d] - covered), ))
            # ties → min doc_id: max over sorted ids keeps the first max
            bg = len(sets[best] - covered)
            for d in sorted(sets):
                if len(sets[d] - covered) == bg:
                    best = d
                    break
            covered |= sets[best]
            want.append((rnd, best, bg, len(covered)))
        assert [tuple(r) for r in got.itertuples(index=False)] == want

    def test_greedy_set_cover_gains_decrease(self, ray_session):
        from kgx.traindata import greedy_set_cover

        got = greedy_set_cover(SF)
        g = got["gain"].to_numpy()
        assert (g[:-1] >= g[1:]).all()  # submodularity of coverage
        assert (got["covered_after"].to_numpy()
                == got["gain"].cumsum().to_numpy()).all()
        assert got["doc_id"].nunique() == len(got)  # never re-selected

    def test_decontaminate_matches_duckdb(self, ray_session):
        import duckdb

        from kgx.queries import DOC_ORACLES
        from kgx.traindata import decontaminate

        got = decontaminate(SF).to_pandas().sort_values("doc_id")
        con = duckdb.connect()
        con.execute("CREATE VIEW documents AS SELECT * FROM "
                    "read_parquet('%s/documents.parquet')" % SF)
        want = con.execute(DOC_ORACLES["decontaminate"]).df() \
            .sort_values("doc_id")
        con.close()
        assert got["doc_id"].tolist() == want["doc_id"].tolist()
        assert got["n_shared_shingles"].tolist() == \
            want["n_shared_shingles"].tolist()
        # a benchmark doc must never appear on the training side
        assert (got["doc_id"] % 50 != 7).all()

    def test_decontaminate_broadcast_plan_equality(self, ray_session):
        """The zero-exchange broadcast plan must compute the IDENTICAL
        frame as the shingle co-group plan — two plans, one answer."""
        from kgx.traindata import decontaminate, decontaminate_broadcast

        a = (decontaminate(SF).to_pandas()
             .sort_values("doc_id").reset_index(drop=True))
        b = (decontaminate_broadcast(SF).to_pandas()
             .sort_values("doc_id").reset_index(drop=True))
        assert a["doc_id"].tolist() == b["doc_id"].tolist()
        assert a["n_shared_shingles"].tolist() == \
            b["n_shared_shingles"].tolist()

    def test_dsir_weights_target_like_scores_higher(self, ray_session,
                                                    tmp_path):
        """Constructed corpus: the training doc that reuses the
        holdout's vocabulary must outscore the one that doesn't, the
        holdout doc itself is excluded, and n_tokens is exact."""
        import os

        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        from kgx.traindata import dsir_weights

        rows = [(7, "alpha beta gamma"),          # holdout (7 % 50 == 7)
                (1, "alpha beta gamma"),          # target-like train doc
                (2, "noise filler junk")]         # source-like train doc
        rows += [(10 + i, "noise filler junk") for i in range(5)]
        df = pd.DataFrame(rows, columns=["doc_id", "text"])
        df["lang"] = "en"
        d = str(tmp_path / "dsir_sf")
        os.makedirs(d)
        pq.write_table(pa.Table.from_pandas(df),
                       os.path.join(d, "documents.parquet"))
        got = dsir_weights(d).to_pandas().set_index("doc_id")
        assert 7 not in got.index
        assert (got["n_tokens"] == 3).all()
        assert got.loc[1, "dsir_q20"] > got.loc[2, "dsir_q20"]

    def test_weighted_sample_bias(self, ray_session, tmp_path):
        """A-Res must favor heavy items: with 10 docs of weight ~100
        competing against 200 docs of weight 1 for k=10 slots, the heavy
        docs dominate the sample (each heavy key ≈ u^(1/100) is near 1).
        Deterministic seed → a fixed, re-runnable assertion."""
        import os

        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        from kgx.traindata import weighted_sample

        rows = [{"doc_id": i, "text": "t%d" % i} for i in range(200)]
        for i in range(10):  # heavy docs: 100 tokens each
            rows.append({"doc_id": 1000 + i,
                         "text": " ".join("h%d_%d" % (i, j)
                                          for j in range(100))})
        d = str(tmp_path / "wsample_sf")
        os.makedirs(d)
        pq.write_table(pa.Table.from_pandas(pd.DataFrame(rows)),
                       os.path.join(d, "documents.parquet"))
        got = weighted_sample(d, k=10).to_pandas()
        assert len(got) == 10
        n_heavy = (got["doc_id"] >= 1000).sum()
        # heavy keys are Beta(100,1) draws vs 200 uniform lights: the
        # lights' top order statistics compete, so expect roughly half
        # the slots heavy (measured 6 with this seed) — against an
        # UNWEIGHTED expectation of 10/210·10 ≈ 0.5 heavy slots
        assert n_heavy >= 4

    def test_pmi_bigrams_constructed(self, ray_session, tmp_path):
        """A bigram whose parts only ever co-occur scores the maximal
        PMI and ranks first; a frequent-but-independent pair scores
        lower; sub-min_count bigrams never appear."""
        import os

        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        from kgx.textops import pmi_bigrams

        # 'alpha beta' always together (6×); 'c d' co-occurs 6× but both
        # tokens also appear apart (8 more times each); 'rare pair' 2×
        docs = []
        for i in range(6):
            docs.append("alpha beta filler%d c d" % i)
        for i in range(8):
            docs.append("c x%d y%d d" % (i, i))
        docs.append("rare pair")
        docs.append("rare pair was here")
        df = pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
        d = str(tmp_path / "pmi_sf")
        os.makedirs(d)
        pq.write_table(pa.Table.from_pandas(df),
                       os.path.join(d, "documents.parquet"))
        got = pmi_bigrams(d, min_count=5, k=10).to_pandas()
        pairs = list(zip(got["x"], got["y"]))
        assert ("rare", "pair") not in pairs  # below min_count
        ab = got[(got.x == "alpha") & (got.y == "beta")]
        cd = got[(got.x == "c") & (got.y == "d")]
        assert len(ab) == 1 and len(cd) == 1
        assert ab["pmi_q20"].iloc[0] > cd["pmi_q20"].iloc[0]
        assert got["pmi_q20"].is_monotonic_decreasing

    def test_cohort_retention_constructed(self, ray_session, tmp_path):
        """Two cohorts with known return patterns: day-0 rows count
        every cohort member once, repeat visits within a day collapse,
        and offsets are relative to each user's own first day."""
        import os

        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        from kgx.events import cohort_retention

        day = 86_400_000_000  # µs
        rows = []
        # users 1,2 start day 0; user 1 returns day 1 (twice) and day 3
        for uid, d in [(1, 0), (1, 1), (1, 1), (1, 3), (2, 0),
                       (3, 1), (3, 2)]:  # user 3 starts day 1
            rows.append({"event_id": len(rows), "user_id": uid,
                         "ts": pd.Timestamp(d * day, unit="us"),
                         "event_type": "view", "value": 1.0,
                         "props": "{}"})
        d = str(tmp_path / "cohort_sf")
        os.makedirs(d)
        pq.write_table(pa.Table.from_pandas(pd.DataFrame(rows)),
                       os.path.join(d, "events.parquet"))
        got = (cohort_retention(d).to_pandas()
               .set_index(["cohort_day", "day_offset"])["n_users"]
               .to_dict())
        assert got == {(0, 0): 2, (0, 1): 1, (0, 3): 1,
                       (1, 0): 1, (1, 1): 1}

    def test_pq_codes_reconstruction(self, ray_session):
        """PQ encoding is a quantizer, so judge it as one: decoding the
        codes must reconstruct the vectors with far less error than the
        1-centroid baseline (the per-subspace mean, i.e. the data's own
        variance), and each (vec, subspace) must get exactly one code."""
        import pandas as pd
        import pyarrow.parquet as pq

        from kgx.simsearch import pq_codes, train_pq_codebooks

        sf = "/root/testdata/sf0.001"
        CB = train_pq_codebooks(sf)  # (m, ksub, sd)
        m, _, sd = CB.shape
        got = pq_codes(sf).to_pandas()
        X = np.array(pq.read_table(
            "%s/embeddings.parquet" % sf,
            columns=["vec_id", "embedding"]).to_pandas()
            .sort_values("vec_id")["embedding"].to_list(), dtype=np.float64)
        codes = (got.pivot(index="vec_id", columns="m", values="code")
                 .sort_index().to_numpy())
        assert codes.shape == (len(X), m)  # exactly one code per cell
        Xhat = np.concatenate(
            [CB[mi][codes[:, mi]] for mi in range(m)], axis=1)
        err = ((X - Xhat) ** 2).sum(axis=1).mean()
        base = np.concatenate(
            [np.broadcast_to(X[:, mi * sd:(mi + 1) * sd].mean(axis=0),
                             (len(X), sd)) for mi in range(m)], axis=1)
        err_base = ((X - base) ** 2).sum(axis=1).mean()
        # synthetic embeddings are near-isotropic — the hardest case for
        # a quantizer; 16 codes over an 8-dim subspace measured ~0.55×
        # the variance here (real clustered data goes far lower)
        assert err < 0.7 * err_base

    def test_winnow_fingerprints_guarantee_and_ties(self, ray_session,
                                                    tmp_path):
        """Pins the two defining winnowing properties: (1) two docs
        sharing a substring of ≥ w+k-1 tokens share at least one
        fingerprint HASH; (2) a window of identical k-gram hashes
        (repeated token runs) selects the RIGHTMOST position."""
        import os

        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        from kgx.dedup import winnow_fingerprints

        shared = " ".join("s%d" % i for i in range(7))  # w+k-1 = 7 tokens
        docs = pd.DataFrame({
            "doc_id": [0, 1, 2],
            "text": ["p0 p1 p2 " + shared + " q0 q1",
                     "r0 " + shared + " r1 r2 r3 r4",
                     "z z z z z z z z"],  # all k-grams identical → ties
        })
        d = str(tmp_path / "winnow_sf")
        os.makedirs(d)
        pq.write_table(pa.Table.from_pandas(docs),
                       os.path.join(d, "documents.parquet"))
        got = winnow_fingerprints(d).to_pandas()
        f0 = set(got.loc[got.doc_id == 0, "fp"])
        f1 = set(got.loc[got.doc_id == 1, "fp"])
        assert f0 & f1, "shared 7-token substring must share a fingerprint"
        # doc 2: 5 k-grams, all equal; every window picks its rightmost
        # position → selected positions are the window ends {3, 4}
        d2 = got[got.doc_id == 2]
        assert sorted(d2["pos"]) == [3, 4]
        assert d2["fp"].nunique() == 1

    def test_ccnet_buckets_boundaries(self, ray_session, tmp_path):
        """Discrete quartile semantics on 8 docs with strictly
        increasing per-token commonality: t25 = the 2nd smallest score,
        t75 = the 6th — so exactly ranks 1-2 are 'tail', 3-6 'middle',
        7-8 'head', and the partition is ordered by ppl_q8."""
        import os

        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        from kgx.traindata import ccnet_buckets

        docs = []
        for i in range(8):
            toks = ["w"] * i + ["u%d_%d" % (i, j) for j in range(8 - i)]
            docs.append({"doc_id": i, "lang": "en", "text": " ".join(toks)})
        d = str(tmp_path / "ccnet_sf")
        os.makedirs(d)
        pq.write_table(pa.Table.from_pandas(pd.DataFrame(docs)),
                       os.path.join(d, "documents.parquet"))
        got = (ccnet_buckets(d).to_pandas()
               .sort_values("ppl_q8").reset_index(drop=True))
        assert got["ppl_q8"].is_monotonic_increasing
        assert got["ppl_q8"].nunique() == 8  # strictly separated scores
        assert got["bucket"].tolist() == (
            ["tail"] * 2 + ["middle"] * 4 + ["head"] * 2)
        # most common-token-heavy doc is the most target-like
        assert got.iloc[-1]["doc_id"] == 7

    def test_bm25_search_ranking(self, ray_session, tmp_path):
        """BM25 semantics on a constructed corpus: a rare query term
        outranks a corpus-wide common one, the query doc itself is never
        retrieved, and ranks are dense from 1 with deterministic
        doc_id tie-breaks."""
        import os

        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        from kgx.traindata import bm25_search

        rows = [{"doc_id": 7, "text": "zebra apple"}]  # the query doc
        rows.append({"doc_id": 0, "text": "zebra x0 x1 x2"})  # rare hit
        for i in range(1, 6):  # 'apple' is common (5 docs)
            rows.append({"doc_id": i, "text": "apple y%d0 y%d1 y%d2"
                         % (i, i, i)})
        rows.append({"doc_id": 6, "text": "nothing shared here at"})
        d = str(tmp_path / "bm25_sf")
        os.makedirs(d)
        pq.write_table(pa.Table.from_pandas(pd.DataFrame(rows)),
                       os.path.join(d, "documents.parquet"))
        got = bm25_search(d, k=10).to_pandas().sort_values("rank")
        assert set(got["qid"]) == {7}
        assert 7 not in set(got["doc_id"])  # holdout never searched
        assert 6 not in set(got["doc_id"])  # no shared token, no score
        assert got["rank"].tolist() == list(range(1, len(got) + 1))
        # rare 'zebra' match ranks above every common 'apple' match
        assert got.iloc[0]["doc_id"] == 0
        # equal-score 'apple' docs tie-break by ascending doc_id
        apple = got[got["doc_id"] > 0]
        assert apple["doc_id"].tolist() == sorted(apple["doc_id"])
        assert apple["score_q20"].nunique() == 1

    def test_segment_dedup_constructed(self, ray_session, tmp_path):
        """Planted duplicate segments: cross-doc dups are removed from
        the later (doc_id, sidx), within-doc dups keep only the first
        occurrence, a fully-duplicated doc collapses to the empty
        string, and clean docs pass through byte-identical."""
        import os

        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        from kgx.traindata import segment_dedup

        seg_a = " ".join("a%d" % i for i in range(4))   # 4-token segment
        seg_b = " ".join("b%d" % i for i in range(4))
        seg_c = " ".join("c%d" % i for i in range(4))
        docs = pd.DataFrame({
            "doc_id": [0, 1, 2, 3],
            "text": [
                seg_a + " " + seg_b,          # keeper of A and B
                seg_c + " " + seg_a,          # loses its A copy
                seg_b,                        # fully duplicated → empty
                seg_c + " " + seg_c + " tail",  # within-doc dup of C
            ],
        })
        d = str(tmp_path / "segdedup_sf")
        os.makedirs(d)
        pq.write_table(pa.Table.from_pandas(docs),
                       os.path.join(d, "documents.parquet"))
        got = (segment_dedup(d, seg_tokens=4).to_pandas()
               .set_index("doc_id").sort_index())
        assert got.loc[0, "text"] == seg_a + " " + seg_b
        assert got.loc[0, "n_removed"] == 0
        assert got.loc[1, "text"] == seg_c  # A copy dropped
        assert got.loc[1, "n_removed"] == 1
        assert got.loc[2, "text"] == ""
        assert (got.loc[2, "n_segments"], got.loc[2, "n_removed"]) == (1, 1)
        # doc 3: segments [C, C, "tail"] — C already kept at doc 1 sidx 0?
        # No: doc 1's C is at (1, 0), doc 3's copies at (3, 0) and (3, 1)
        # both lose; "tail" survives.
        assert got.loc[3, "text"] == "tail"
        assert got.loc[3, "n_removed"] == 2
        assert got["n_segments"].tolist() == [2, 2, 1, 3]

    def test_token_quantiles_discrete_rule(self, ray_session, tmp_path):
        """Pins the ceil(q·N)-th-smallest rule on a constructed N=4
        distribution where the interpolating conventions would differ."""
        import os

        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        from kgx.traindata import token_quantiles

        texts = ["a", "a b", "a b c", "a b c d"]  # lengths 1..4
        df = pd.DataFrame({"doc_id": range(4), "text": texts, "lang": "en"})
        d = str(tmp_path / "tq_sf")
        os.makedirs(d)
        pq.write_table(pa.Table.from_pandas(df),
                       os.path.join(d, "documents.parquet"))
        got = token_quantiles(d).to_pandas().set_index("q_pct")[
            "n_tokens"].to_dict()
        # ceil(0.25*4)=1st, ceil(0.5*4)=2nd, ceil(0.9*4)=4th, ceil(0.99*4)=4th
        assert got == {25: 1, 50: 2, 90: 4, 99: 4}

    def test_distinct_token_kmv_estimate(self, ray_session, tmp_path):
        """KMV estimate within the k=256 error envelope vs the exact
        distinct count at SF, and the <k path returns the exact count."""
        import os

        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        from kgx.traindata import distinct_token_kmv

        row = distinct_token_kmv(SF).to_pandas().iloc[0]
        exact = len({t for text in pq.read_table(
            "%s/documents.parquet" % SF, columns=["text"])["text"]
            .to_pylist() for t in text.split(" ")})
        if row["k_used"] < 256:
            assert row["est_distinct"] == exact
        else:
            # standard KMV relative error ~1/sqrt(k) = 6.25%; allow 4x
            assert abs(row["est_distinct"] - exact) <= 0.25 * exact

        # tiny corpus (< k distinct tokens) → exact count, kth = max hash
        df = pd.DataFrame({"doc_id": [1, 2],
                           "text": ["a b c", "c d"], "lang": "en"})
        d = str(tmp_path / "kmv_sf")
        os.makedirs(d)
        pq.write_table(pa.Table.from_pandas(df),
                       os.path.join(d, "documents.parquet"))
        small = distinct_token_kmv(d).to_pandas().iloc[0]
        assert small["k_used"] == 4 and small["est_distinct"] == 4

    def test_inverted_index_cap_and_exact_df(self, ray_session, tmp_path):
        """A hot token keeps EXACT df but only the 32 smallest doc_ids
        as postings; a rare token keeps all of its postings."""
        import os

        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        from kgx.traindata import inverted_index

        rows = [(i, "common" + (" rare" if i in (3, 50) else ""))
                for i in range(40)] + [(50, "common rare")]
        df = pd.DataFrame(rows[:40] + [rows[-1]],
                          columns=["doc_id", "text"])
        df["lang"] = "en"
        d = str(tmp_path / "inv_sf")
        os.makedirs(d)
        pq.write_table(pa.Table.from_pandas(df),
                       os.path.join(d, "documents.parquet"))
        got = inverted_index(d).to_pandas()
        hot = got[got["tok"] == "common"]
        assert (hot["df"] == 41).all() and len(hot) == 32
        assert sorted(hot["doc_id"]) == list(range(32))
        rare = got[got["tok"] == "rare"]
        assert (rare["df"] == 2).all()
        assert sorted(rare["doc_id"]) == [3, 50]

    def test_triangle_count_constructed(self, ray_session, tmp_path):
        """A 4-clique of identical docs yields C(4,3)=4 triangles; a
        separate identical pair adds an edge but no triangle."""
        import os

        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        from kgx.components import triangle_count

        rows = [(i, "alpha beta gamma delta") for i in range(4)]
        rows += [(10, "omega psi chi"), (11, "omega psi chi")]
        rows += [(20, "solo unique text here")]
        df = pd.DataFrame(rows, columns=["doc_id", "text"])
        df["lang"] = "en"
        d = str(tmp_path / "tri_sf")
        os.makedirs(d)
        pq.write_table(pa.Table.from_pandas(df),
                       os.path.join(d, "documents.parquet"))
        got = triangle_count(d).to_pandas()
        assert got["n_triangles"].tolist() == [4]

    def test_curate_corpus_composition(self, ray_session):
        # the composed pipeline == the composed recursive-CTE oracle,
        # and every stage's contract holds on the output
        import duckdb
        import pyarrow.parquet as pq

        from kgx.dedup import near_dup_dedup
        from kgx.queries import DOC_ORACLES
        from kgx.traindata import curate_corpus, decontaminate

        got = curate_corpus(SF).to_pandas().sort_values("doc_id") \
            .reset_index(drop=True)
        con = duckdb.connect()
        con.execute("CREATE VIEW documents AS SELECT * FROM "
                    "read_parquet('%s/documents.parquet')" % SF)
        want = con.execute(DOC_ORACLES["curate_corpus"]).df() \
            .sort_values("doc_id").reset_index(drop=True)
        con.close()
        assert got[["doc_id", "lang", "shard", "seq_id"]].equals(
            want[["doc_id", "lang", "shard", "seq_id"]])

        ids = set(got["doc_id"])
        assert ids <= set(near_dup_dedup(SF).to_pandas()["doc_id"])
        assert not ids & set(decontaminate(SF).to_pandas()["doc_id"])
        assert all(d % 50 != 7 for d in ids)
        t = pq.read_table("%s/documents.parquet" % SF,
                          columns=["doc_id", "text"]).to_pandas()
        ntok = dict(zip(t["doc_id"], t["text"].str.count(" ") + 1))
        assert all(ntok[d] >= 20 for d in ids)

    def test_seeded_sample_deterministic_and_bounded(self, ray_session):
        from kgx.traindata import seeded_sample

        a = sorted(seeded_sample(SF).to_pandas()["doc_id"])
        b = sorted(seeded_sample(SF).to_pandas()["doc_id"])
        assert a == b
        assert 0.15 <= len(a) / 500 <= 0.35  # frac=0.25 ± sampling noise
        assert sorted(seeded_sample(SF, seed=7).to_pandas()["doc_id"]) != a

    def test_stratified_sample_per_group_quota(self, ray_session):
        from kgx.traindata import stratified_sample

        df = stratified_sample(SF, n_per_group=30).to_pandas()
        counts = df.groupby("lang").size()
        assert (counts <= 30).all() and counts.sum() == len(df)
        again = stratified_sample(SF, n_per_group=30).to_pandas()
        assert sorted(df["doc_id"]) == sorted(again["doc_id"])

    def test_temperature_mix_matches_integer_replay(self, ray_session):
        import math

        import pyarrow.parquet as pq

        from kgx.traindata import _md5_u64, temperature_mix

        got = set(map(tuple, temperature_mix(SF)
                      .to_pandas()[["doc_id", "lang"]].values))
        t = pq.read_table("%s/documents.parquet" % SF,
                          columns=["doc_id", "lang"])
        rows = list(zip(t.column("doc_id").to_pylist(),
                        t.column("lang").to_pylist()))
        n: dict = {}
        for _, g in rows:
            n[g] = n.get(g, 0) + 1
        w = {g: math.isqrt(c << 40) for g, c in n.items()}
        W = sum(w.values())
        thr = {g: (200 * w[g] * (1 << 64)) // (W * n[g]) for g in n}
        want = {(d, g) for d, g in rows
                if _md5_u64("%d:42" % d) < thr[g]}
        assert got == want and len(got) > 0
        # the temperature effect: every rare group keeps a HIGHER
        # fraction of its docs than the most common group
        kept: dict = {}
        for _, g in got:
            kept[g] = kept.get(g, 0) + 1
        top = max(n, key=n.get)
        for g in n:
            if n[g] < n[top] / 2:
                assert kept.get(g, 0) / n[g] > kept[top] / n[top]

    def test_shipping_priority_contract(self, ray_session):
        from kgx.relational import shipping_priority

        df = shipping_priority(SF).to_pandas()
        assert 0 < len(df) <= 10
        # revenue is the primary sort key, strictly non-increasing
        rev = df["revenue_q2"].to_numpy()
        assert (rev[:-1] >= rev[1:]).all()
        assert (df["o_orderdate"] < "1998-01-01").all()
        again = shipping_priority(SF).to_pandas()
        assert df.values.tolist() == again.values.tolist()

    def test_shipping_priority_plans_agree(self, ray_session):
        """The broadcast semi-join plan (one exchange) and the
        hash(custkey) co-group plan (huge-customer fallback) return the
        same rows."""
        from kgx.relational import shipping_priority

        cols = ["l_orderkey", "revenue_q2", "o_orderdate",
                "o_orderpriority"]
        a = (shipping_priority(SF, plan="broadcast").to_pandas()
             .sort_values(cols).reset_index(drop=True))
        b = (shipping_priority(SF, plan="exchange").to_pandas()
             .sort_values(cols).reset_index(drop=True))
        assert a.equals(b)

    def test_gopher_filter_rules_live(self, ray_session):
        from kgx.textops import gopher_filter

        df = gopher_filter(SF).to_pandas()
        assert len(df) == 500
        # the gate discriminates on this corpus (both classes present)
        assert df["keep"].any() and (~df["keep"]).any()
        # rule recomputation on the returned counts
        want = ((df["n_words"] >= 50) & (df["n_words"] <= 100_000)
                & (3 * df["n_words"] <= df["len_sum"])
                & (df["len_sum"] <= 10 * df["n_words"])
                & (5 * df["n_alpha_words"] >= 4 * df["n_words"])
                & (df["n_stopwords"] >= 2))
        assert (df["keep"] == want).all()
        # loosening the floor can only widen the kept set
        loose = gopher_filter(SF, min_words=1).to_pandas()
        assert set(df.loc[df["keep"], "doc_id"]) <= set(
            loose.loc[loose["keep"], "doc_id"])

    def test_rrf_fusion_matches_manual_fusion(self, ray_session):
        import pandas as pd

        from kgx.simsearch import knn_bruteforce
        from kgx.traindata import bm25_search, rrf_fusion

        got = rrf_fusion(SF).to_pandas()
        sp = bm25_search(SF, k=10, n_queries=10, bench_mod=50,
                         bench_rem=0).to_pandas()
        de = knn_bruteforce(SF, stride=50, k=5).to_pandas()
        de = de[de["query_id"] < 500]
        rows = pd.concat([
            pd.DataFrame({"qid": sp["qid"], "doc_id": sp["doc_id"],
                          "c": 1048576 // (60 + sp["rank"])}),
            pd.DataFrame({"qid": de["query_id"], "doc_id": de["neighbor_id"],
                          "c": 1048576 // (60 + de["rank"])})])
        want = []
        for qid, g in rows.groupby("qid"):
            f = g.groupby("doc_id", as_index=False)["c"].sum()
            f = f.sort_values(["c", "doc_id"],
                              ascending=[False, True]).head(10)
            for r, (_, row) in enumerate(f.iterrows(), 1):
                want.append((qid, r, row["doc_id"], row["c"]))
        key = ["qid", "rank", "doc_id", "rrf_q20"]
        assert sorted(map(tuple, got[key].values)) == sorted(want)
        # fusion is live on both sides: some fused doc must come from
        # the dense list beyond BM25's reach, and vice versa
        sp_set = set(map(tuple, sp[["qid", "doc_id"]].values))
        de_set = set(map(tuple, de[["query_id", "neighbor_id"]].values))
        fused = set(map(tuple, got[["qid", "doc_id"]].values))
        assert fused & (de_set - sp_set) and fused & (sp_set - de_set)

    def test_pack_sequences_greedy_invariants(self, ray_session):
        import pyarrow.parquet as pq

        from kgx.traindata import pack_sequences

        cap = 256
        df = pack_sequences(SF, capacity=cap).to_pandas()
        t = pq.read_table("%s/documents.parquet" % SF,
                          columns=["doc_id", "text"]).to_pandas()
        ntok = dict(zip(t["doc_id"], t["text"].str.count(" ") + 1))
        assert len(df) == len(t)  # every doc lands in exactly one seq
        for (_lang, _shard), g in df.groupby(["lang", "shard"]):
            g = g.sort_values("doc_id")
            seqs = g.groupby("seq_id")["doc_id"].apply(list)
            assert sorted(seqs.index) == list(range(1, len(seqs) + 1))
            for seq_id, members in seqs.items():
                total = sum(ntok[d] for d in members)
                # a multi-doc sequence respects the capacity...
                if len(members) > 1:
                    assert total <= cap
                # ...and was closed greedily: the next sequence's first
                # doc would not have fit
                if seq_id + 1 in seqs:
                    nxt = ntok[seqs[seq_id + 1][0]]
                    assert total + nxt > cap

    def test_funnel_stages_cascade_semantics(self, ray_session, tmp_path):
        """Constructed cases pin each stage and the STRICTLY-AFTER rule:
        a purchase before the first view counts nothing; a click at the
        exact first-view timestamp does not advance (strict >)."""
        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        from kgx.events import funnel_stages

        t0 = pd.Timestamp("2026-01-01")
        rows = [
            # user 1: full funnel in order -> 3
            (1, t0, "view"), (1, t0 + pd.Timedelta("1min"), "click"),
            (1, t0 + pd.Timedelta("2min"), "purchase"),
            # user 2: purchase BEFORE view -> only stage 1
            (2, t0, "purchase"), (2, t0 + pd.Timedelta("1min"), "view"),
            # user 3: click at the SAME ts as first view (strict >) -> 1
            (3, t0, "view"), (3, t0, "click"),
            # user 4: no funnel events at all -> 0
            (4, t0, "error"),
            # user 5: view then click, no purchase -> 2
            (5, t0, "view"), (5, t0 + pd.Timedelta("1min"), "click"),
        ]
        df = pd.DataFrame(rows, columns=["user_id", "ts", "event_type"])
        df["event_id"] = range(len(df))
        df["value"] = 0.0
        df["props"] = ""
        d = str(tmp_path / "funnel_sf")
        import os as _os
        _os.makedirs(d)
        pq.write_table(pa.Table.from_pandas(df), _os.path.join(
            d, "events.parquet"))
        got = funnel_stages(d).to_pandas().set_index("user_id")[
            "funnel_stage"].to_dict()
        assert got == {1: 3, 2: 1, 3: 1, 4: 0, 5: 2}

    def test_props_stats_json_extraction(self, ray_session, tmp_path):
        """Constructed JSON props pin the extraction: missing key and
        non-integer rows drop out, negatives aggregate correctly."""
        import os

        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        from kgx.events import props_stats

        t0 = pd.Timestamp("2026-01-01")
        rows = [
            ("view", '{"k": 10}'), ("view", '{"k": -3}'),
            ("view", '{"other": 1}'),          # missing key -> dropped
            ("click", '{"k": 7}'), ("click", ""),  # empty props -> dropped
        ]
        df = pd.DataFrame(rows, columns=["event_type", "props"])
        df["event_id"] = range(len(df))
        df["user_id"] = 1
        df["ts"] = t0
        df["value"] = 0.0
        d = str(tmp_path / "props_sf")
        os.makedirs(d)
        pq.write_table(pa.Table.from_pandas(df),
                       os.path.join(d, "events.parquet"))
        got = props_stats(d).to_pandas().set_index("event_type")
        assert got.loc["view"].to_dict() == {"n": 2, "sum_k": 7, "max_k": 10}
        assert got.loc["click"].to_dict() == {"n": 1, "sum_k": 7, "max_k": 7}
        assert len(got) == 2

    def test_chunk_documents_window_invariants(self, ray_session):
        import pyarrow.parquet as pq

        from kgx.traindata import chunk_documents

        chunk, overlap = 64, 8
        df = chunk_documents(SF, chunk_tokens=chunk,
                             overlap=overlap).to_pandas()
        t = pq.read_table("%s/documents.parquet" % SF,
                          columns=["doc_id", "text"]).to_pandas()
        toks = dict(zip(t["doc_id"], t["text"].str.split(" ")))
        # every doc chunked; short docs yield exactly one chunk
        assert set(df["doc_id"]) == set(t["doc_id"])
        stride = chunk - overlap
        for doc_id, g in df.groupby("doc_id"):
            n = len(toks[doc_id])
            k = max(1, -(-(n - overlap) // stride))
            assert sorted(g["chunk_id"]) == list(range(k))
            for _, row in g.iterrows():
                start = row["chunk_id"] * stride
                want = toks[doc_id][start:start + chunk]
                assert row["n_tokens"] == len(want)
                assert row["chunk_text"] == " ".join(want)
            # reassembly: dropping each chunk's overlap prefix (after the
            # first) reconstructs the document exactly
            parts = []
            for _, row in g.sort_values("chunk_id").iterrows():
                words = row["chunk_text"].split(" ")
                parts.extend(words if row["chunk_id"] == 0
                             else words[overlap:])
            assert parts == toks[doc_id][:len(parts)] and \
                len(parts) == n


class TestMultimodal:
    def test_decode_stub_raises(self):
        from kgx.multimodal import decode_image

        with pytest.raises(NotImplementedError):
            decode_image(b"\x89PNG")

    def test_bmp_roundtrip_exact(self):
        import numpy as np

        from kgx.multimodal import decode_bmp, encode_bmp

        # deterministic pseudo-random bytes, non-multiple of a row
        data = bytes((i * 37 + 11) % 256 for i in range(1000))
        img = decode_bmp(encode_bmp(data, width=7))  # stride pad = 3
        assert img.shape == (48, 7, 3)  # ceil(1000/21) = 48 rows
        # undo RGB→ and row-major flatten recovers the padded bytes
        flat = img[:, :, ::-1].reshape(-1)
        assert bytes(flat[:1000]) == data
        assert not flat[1000:].any()

    def test_bmp_decoder_drives_feature_extractor(self, ray_session):
        import numpy as np
        import pandas as pd

        from kgx.multimodal import FeatureExtractor, encode_bmp

        data = b"hello bmp world" * 20
        fx = FeatureExtractor(decoder="bmp")
        df = pd.DataFrame({"doc_id": [1],
                           "payload": [encode_bmp(data, width=8)]})
        got = np.array(fx(df)["feature"].iloc[0])
        # expected: projection of the DECODED pixel histogram =
        # histogram of data bytes + grid-padding zeros
        row = 3 * 8
        h = -(-len(data) // row)
        padded = data + b"\x00" * (h * row - len(data))
        hist = np.bincount(np.frombuffer(padded, dtype=np.uint8),
                           minlength=256).astype(np.float64)
        assert np.array_equal(got, hist @ fx.W)

    def test_payload_resize_deterministic(self, ray_session):
        from kgx.multimodal import payload_resize

        df = payload_resize(SF, out_w=4, out_h=4).to_pandas()
        assert len(df) == 500
        assert (df["out_w"] == 4).all()
        # stride-sampled stub: payload shrinks to at most out_w*out_h bytes
        assert df["payload"].map(len).max() <= 16
        df2 = payload_resize(SF, out_w=4, out_h=4).to_pandas()
        a = df.sort_values("doc_id")["payload"].tolist()
        b = df2.sort_values("doc_id")["payload"].tolist()
        assert a == b

    def test_frame_sample_geometry(self, ray_session):
        import pyarrow.parquet as pq

        from kgx.multimodal import frame_sample

        df = frame_sample(SF, frame_bytes=16, every_n=4).to_pandas()
        t = pq.read_table("%s/documents.parquet" % SF,
                          columns=["doc_id", "text"])
        for doc_id, text in zip(t.column("doc_id").to_pylist()[:30],
                                t.column("text").to_pylist()[:30]):
            n = len(text.encode("utf-8"))
            n_frames = -(-n // 16)
            expect_idx = list(range(0, n_frames, 4))
            got = df[df["doc_id"] == doc_id].sort_values("frame_idx")
            assert got["frame_idx"].tolist() == expect_idx
            assert (got["n_bytes"] == [min(16, n - i * 16)
                                       for i in expect_idx]).all()

    def test_decoder_injection_both_ways(self):
        # the decode branch is real plumbing: with an injected decoder
        # (standing in for PIL) both stages consume (h, w, 3) pixel
        # arrays; without one they fall back to byte-level features
        import pandas as pd

        from kgx.multimodal import FeatureExtractor, Resizer

        def fake_decode(payload):
            buf = np.frombuffer(payload, dtype=np.uint8)
            reps = -(-6 * 8 * 3 // max(1, len(buf)))
            return np.tile(buf, reps)[:6 * 8 * 3].reshape(6, 8, 3)

        batch = pd.DataFrame({"doc_id": [1, 2],
                              "payload": [b"hello world", b"abcdef" * 40]})

        feats_dec = FeatureExtractor(decoder=fake_decode)(batch)
        feats_raw = FeatureExtractor(decoder=None)(batch)
        assert all(len(f) == 16 for f in feats_dec["feature"])
        # n_bytes is the PAYLOAD size on both paths (oracle semantics)
        assert feats_dec["n_bytes"].tolist() == [11, 240]
        assert feats_dec["n_bytes"].tolist() == feats_raw["n_bytes"].tolist()

        rs_dec = Resizer(out_w=4, out_h=4, decoder=fake_decode)(batch)
        rs_raw = Resizer(out_w=4, out_h=4, decoder=None)(batch)
        # decoded path: exactly out_h*out_w*3 RGB bytes per payload
        assert rs_dec["payload"].map(len).tolist() == [48, 48]
        # fallback path: at most out_h*out_w stride-sampled bytes
        assert rs_raw["payload"].map(len).max() <= 16
        # both deterministic
        assert rs_dec["payload"].tolist() == \
            Resizer(out_w=4, out_h=4, decoder=fake_decode)(batch)["payload"].tolist()

    def test_payload_features(self, ray_session):
        from kgx.multimodal import payload_features

        df = payload_features(SF).to_pandas()
        assert len(df) == 500
        assert all(len(f) == 16 for f in df["feature"])
        # deterministic "model": same payload → same features across runs
        df2 = payload_features(SF).to_pandas()
        m1 = dict(zip(df["doc_id"], [tuple(f) for f in df["feature"]]))
        m2 = dict(zip(df2["doc_id"], [tuple(f) for f in df2["feature"]]))
        assert m1 == m2


class TestNoOracleCrossChecks:
    """Quantitative self-checks for the operators whose semantics a SQL
    oracle cannot express (VERDICT r01 item 1): LSH recall against exact
    ground truth, IVF recall against brute force."""

    def test_minhash_lsh_recall_vs_exact_jaccard(self, ray_session):
        # with shingle_k=1 the LSH estimates token-SET Jaccard — the exact
        # similarity jaccard_pairs computes — so recall is well-defined
        from kgx.dedup import jaccard_pairs, minhash_lsh_pairs

        gt = jaccard_pairs(SF).to_pandas()
        gt_set = set(zip(gt["doc_id_a"], gt["doc_id_b"]))
        lsh = minhash_lsh_pairs(SF, threshold=0.7, shingle_k=1,
                                max_bucket=2000).to_pandas()
        lsh_set = set(zip(lsh["doc_id_a"], lsh["doc_id_b"]))
        recall = len(gt_set & lsh_set) / len(gt_set)
        assert recall >= 0.95, recall  # measured 0.995 at sf0.001

    def test_simhash_deterministic_across_runs(self, ray_session):
        from kgx.dedup import simhash

        d1 = simhash(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
        d2 = simhash(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
        assert (d1["simhash"] == d2["simhash"]).all()

    def test_lang_id_accuracy_on_real_sentences(self):
        # the documents.lang column is uncorrelated with the synthetic
        # word-salad text, so accuracy is pinned on real sentences instead
        # (the operator itself is DuckDB-oracle-checked for exactness)
        from kgx.textops import classify_lang

        cases = {
            "the cat and the dog went to the market of the town": "en",
            "der Hund ist nicht mit der Katze und das ist gut": "de",
            "le chat est dans la maison et les oiseaux dans une cage": "fr",
            "el perro es para los gatos con una casa en que vivir": "es",
            "这是一个中文文本这是一个中文文本这是一个中文文本": "zh",
            "": "und",
        }
        for text, want in cases.items():
            assert classify_lang(text) == want, text


class TestSketchesAndShards:
    def test_heavy_hitters_cms_guarantee(self, ray_session):
        """CMS estimates dominate true counts, and every TRUE heavy
        hitter is reported (recall 1.0 — the one-sided CMS guarantee)."""
        import pandas as pd
        import pyarrow.parquet as pq

        from kgx.traindata import heavy_hitters

        out = heavy_hitters(SF).to_pandas()
        docs = pq.read_table(SF + "/documents.parquet",
                             columns=["text"]).to_pandas()
        true = docs["text"].str.split(" ").explode().value_counts()
        total = int(true.sum())
        thresh = (total * 34 + 999) // 1000
        est = dict(zip(out["tok"], out["est"]))
        # every reported estimate >= the true count (est never undercounts)
        for tok, e in est.items():
            assert e >= int(true[tok])
        # every true heavy hitter is reported
        for tok, c in true.items():
            if int(c) >= thresh:
                assert tok in est

    def test_hll_estimate_branches(self):
        """The exact-integer HLL estimator: raw harmonic branch on dense
        registers, linear counting on sparse ones — both closed-form."""
        import math

        from kgx.traindata import _hll_estimate

        m = 256
        # sparse: 16 registers at rho=1, 240 empty -> linear counting
        regs = [1] * 16 + [0] * 240
        est, zeros = _hll_estimate(regs, m)
        assert zeros == 240
        assert est == int(math.floor(m * math.log(m / 240)))
        # dense: all registers at rho=3 -> raw integer formula
        regs = [3] * m
        est, zeros = _hll_estimate(regs, m)
        assert zeros == 0
        s = m * (1 << 61)
        assert est == (7213 * 256000 * m * m << 64) // (10000 * 257079 * s)

    def test_hll_accuracy_vs_exact(self, ray_session):
        """p=8 → ~6.5% standard error; assert within 20% of the exact
        distinct-shingle count."""
        import pyarrow.parquet as pq

        from kgx.traindata import hll_distinct

        out = hll_distinct(SF)
        docs = pq.read_table(SF + "/documents.parquet",
                             columns=["text"]).to_pandas()
        sh = set()
        for t in docs["text"]:
            toks = t.split(" ")
            for i in range(len(toks) - 2):
                sh.add(" ".join(toks[i:i + 3]))
        true = len(sh)
        est = int(out["est_distinct"].iloc[0])
        assert abs(est - true) <= 0.2 * true

    def test_shard_corpus_is_a_partition(self, ray_session):
        """Every doc appears exactly once; ranks are dense 0..N-1; every
        shard except the last holds exactly shard_size docs."""
        import pyarrow.parquet as pq

        from kgx.traindata import shard_corpus

        out = shard_corpus(SF, shard_size=100).to_pandas()
        n = len(pq.read_table(SF + "/documents.parquet",
                              columns=["doc_id"]))
        assert len(out) == n
        assert out["doc_id"].nunique() == n
        ranks = sorted(out["shard"] * 100 + out["pos"])
        assert ranks == list(range(n))
        sizes = out["shard"].value_counts()
        full = sorted(sizes.index)[:-1]
        assert all(sizes[s] == 100 for s in full)

    def test_shard_corpus_deterministic(self, ray_session):
        from kgx.traindata import shard_corpus

        a = (shard_corpus(SF).to_pandas()
             .sort_values("doc_id").reset_index(drop=True))
        b = (shard_corpus(SF).to_pandas()
             .sort_values("doc_id").reset_index(drop=True))
        assert a.equals(b)


class TestBpeTrain:
    def test_bpe_apply_greedy_left_to_right(self):
        """The merge walk is greedy, leftmost-first, non-overlapping —
        the semantics the SQL oracle's recursive CTE replays."""
        from kgx.traindata import _bpe_apply

        assert _bpe_apply("aaa", [("a", "a")]) == ["aa", "a"]
        assert _bpe_apply("abab", [("a", "b")]) == ["ab", "ab"]
        assert _bpe_apply("aabb", [("a", "b")]) == ["a", "ab", "b"]
        # merges compose in order: (a,b) then (ab,ab)
        assert _bpe_apply("abab", [("a", "b"), ("ab", "ab")]) == ["abab"]

    def test_bpe_train_matches_local_reference(self, ray_session):
        """The distributed trainer equals a pure-Python Sennrich-style
        reference run on the same corpus."""
        import pyarrow.parquet as pq

        from kgx.traindata import _bpe_apply, bpe_train

        out = bpe_train(SF, num_merges=4)
        docs = pq.read_table(SF + "/documents.parquet",
                             columns=["text"]).to_pandas()
        freq = docs["text"].str.split(" ").explode().value_counts()
        merges = []
        for _ in range(4):
            pairs = {}
            for word, f in freq.items():
                seq = _bpe_apply(word, merges)
                for i in range(len(seq) - 1):
                    k = (seq[i], seq[i + 1])
                    pairs[k] = pairs.get(k, 0) + int(f)
            best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
            merges.append(best[0])
        got = list(zip(out["l"], out["r"]))
        assert got == merges

    def test_bpe_encode_bounds(self, ray_session):
        """Per-doc BPE token counts sit between the word count (every
        word is ≥1 symbol) and the character count (merges only shrink),
        and each merge round can only reduce the total."""
        import pyarrow.parquet as pq

        from kgx.traindata import bpe_encode

        out = (bpe_encode(SF).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        docs = (pq.read_table(SF + "/documents.parquet",
                              columns=["doc_id", "text"]).to_pandas()
                .sort_values("doc_id").reset_index(drop=True))
        chars = (docs["text"].str.len()
                 - docs["text"].str.count(" ")).to_numpy()
        assert (out["n_bpe_tokens"].to_numpy() <= chars).all()
        assert (out["n_bpe_tokens"] >= out["n_words"]).all()
        fewer = bpe_encode(SF, num_merges=2).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        assert (out["n_bpe_tokens"] <= fewer["n_bpe_tokens"]).all()

    def test_decontaminate_bloom_dominates_exact(self, ray_session):
        """Bloom membership never misses: per-doc bloom hits >= the
        exact shared-shingle count, and every exactly-contaminated doc
        is flagged (false positives only, never false negatives)."""
        from kgx.traindata import decontaminate, decontaminate_bloom

        exact = (decontaminate(SF).to_pandas()
                 .set_index("doc_id")["n_shared_shingles"])
        bloom = (decontaminate_bloom(SF).to_pandas()
                 .set_index("doc_id")["n_bloom_hits"])
        assert set(exact.index) <= set(bloom.index)
        for d, n in exact.items():
            assert bloom[d] >= n


class TestWavDecode:
    def test_wav_roundtrip_exact(self):
        """decode(encode(bytes)) equals the struct-unpacked reference,
        including negative samples (high bytes ≥ 0x80)."""
        import struct

        import numpy as np

        from kgx.multimodal import decode_wav, encode_wav

        data = bytes((7 * i + 13) % 256 for i in range(257))  # odd length
        s = decode_wav(encode_wav(data))
        padded = data + b"\x00"
        ref = struct.unpack("<%dh" % (len(padded) // 2), padded)
        assert s.tolist() == list(ref)
        assert (np.array(ref) < 0).any()  # the signed path is exercised

    def test_wav_chunk_walker_skips_unknown_chunks(self):
        """A LIST chunk (odd-sized, pad byte per RIFF spec) inserted
        before data must not shift the decode."""
        import struct

        from kgx.multimodal import decode_wav, encode_wav

        wav = bytearray(encode_wav(b"abcd"))
        extra = b"LIST" + struct.pack("<I", 3) + b"junk"  # 3 + pad byte
        di = wav.index(b"data")
        patched = bytes(wav[:di]) + extra + bytes(wav[di:])
        patched = (patched[:4]
                   + struct.pack("<I", len(patched) - 8) + patched[8:])
        assert decode_wav(patched).tolist() == decode_wav(bytes(wav)).tolist()

    def test_wav_rejects_non_pcm(self):
        import struct

        import pytest as _pytest

        from kgx.multimodal import decode_wav, encode_wav

        with _pytest.raises(ValueError):
            decode_wav(b"RIFX" + b"\x00" * 40)
        wav = bytearray(encode_wav(b"abcd"))
        fi = wav.index(b"fmt ") + 8
        wav[fi:fi + 2] = struct.pack("<H", 85)  # mp3 codec id
        with _pytest.raises(ValueError):
            decode_wav(bytes(wav))


class TestWindowAndRollup:
    def test_running_totals_matches_local(self, ray_session):
        """Per-user cumulative sums equal a single-process pandas replay."""
        import numpy as np
        import pyarrow.parquet as pq

        from kgx.events import running_totals

        out = (running_totals(SF).to_pandas()
               .sort_values("event_id").reset_index(drop=True))
        ev = (pq.read_table(SF + "/events.parquet",
                            columns=["event_id", "user_id", "ts", "value"])
              .to_pandas().sort_values(["user_id", "ts", "event_id"]))
        ev["vq"] = np.floor(100.0 * ev["value"].to_numpy()).astype("int64")
        ev["cum"] = ev.groupby("user_id")["vq"].cumsum()
        ref = ev.set_index("event_id")["cum"].sort_index()
        got = out.set_index("event_id")["cum_value_q2"].sort_index()
        assert (got == ref).all()

    def test_rollup_levels_consistent(self, ray_session):
        """Detail rows sum to their lang subtotal; lang subtotals sum to
        the grand total."""
        from kgx.textops import rollup_stats

        df = rollup_stats(SF).to_pandas()
        detail = df[(df["lang"] != "*") & (df["source"] != "*")]
        lang_sub = df[(df["lang"] != "*") & (df["source"] == "*")]
        grand = df[(df["lang"] == "*") & (df["source"] == "*")]
        assert len(grand) == 1
        assert grand["n_docs"].iloc[0] == detail["n_docs"].sum()
        assert grand["n_tokens"].iloc[0] == detail["n_tokens"].sum()
        for _, row in lang_sub.iterrows():
            d = detail[detail["lang"] == row["lang"]]
            assert row["n_docs"] == d["n_docs"].sum()
            assert row["n_tokens"] == d["n_tokens"].sum()

    def test_range_join_counts_matches_local(self, ray_session):
        """The banded self-join equals a direct per-purchase interval
        count, including the [ts-60min, ts) boundary semantics."""
        import pandas as pd
        import pyarrow.parquet as pq

        from kgx.events import range_join_counts

        out = (range_join_counts(SF).to_pandas()
               .set_index("event_id")["n_right_in_window"].sort_index())
        ev = pq.read_table(SF + "/events.parquet",
                           columns=["event_id", "ts", "user_id",
                                    "event_type"]).to_pandas()
        views = ev[ev["event_type"] == "view"]
        delta = pd.Timedelta(minutes=60)
        ref = {}
        for _, p in ev[ev["event_type"] == "purchase"].iterrows():
            v = views[views["user_id"] == p["user_id"]]
            ref[int(p["event_id"])] = int(
                ((v["ts"] < p["ts"]) & (v["ts"] >= p["ts"] - delta)).sum())
        assert dict(out) == ref

    def test_freq_spectrum_identities(self, ray_session):
        """Σ n_types = vocabulary size and Σ k·n_types = total token
        occurrences — the two Good–Turing mass identities."""
        import pyarrow.parquet as pq

        from kgx.textops import freq_spectrum

        df = freq_spectrum(SF).to_pandas()
        docs = pq.read_table(SF + "/documents.parquet",
                             columns=["text"]).to_pandas()
        toks = docs["text"].str.split(" ").explode()
        assert df["n_types"].sum() == toks.nunique()
        assert (df["k"] * df["n_types"]).sum() == len(toks)

    def test_max_concurrent_sessions_replays_locally(self, ray_session):
        """The distributed sweep (carry-in + per-hour local scan) equals
        a single-process global sweep over the same session intervals."""
        from kgx.events import max_concurrent_sessions, session_table

        sess = session_table(SF).to_pandas()
        deltas = []
        for u, s, a, b in sess[["user_id", "session_idx", "start_us",
                                "end_us"]].itertuples(index=False):
            deltas.append((a, 1, u, s))
            deltas.append((b + 1, -1, u, s))
        deltas.sort()
        run, want = 0, {}
        for t, dd, _, _ in deltas:
            run += dd
            h = t // 3_600_000_000
            want[h] = max(want.get(h, run), run)
        got = (max_concurrent_sessions(SF).to_pandas()
               .set_index("hour")["max_concurrent"].to_dict())
        assert got == want
        # sanity: peak concurrency never exceeds the live user count
        assert max(got.values()) <= sess["user_id"].nunique()

    def test_session_table_consistent_with_sessionize(self, ray_session):
        """The session table's per-user session counts and event totals
        equal sessionize's, sessions are disjoint in time per user, and
        intra-session gaps never exceed the threshold."""
        from kgx.events import session_table, sessionize

        st = session_table(SF).to_pandas()
        sz = sessionize(SF).to_pandas().set_index("user_id")
        per_user = st.groupby("user_id").agg(
            n_sessions=("session_idx", "nunique"),
            n_events=("n_events", "sum"))
        for u, row in per_user.iterrows():
            assert row["n_sessions"] == sz.loc[u, "n_sessions"], u
            assert row["n_events"] == sz.loc[u, "n_events"], u
        for u, g in st.groupby("user_id"):
            g = g.sort_values("session_idx")
            assert (g["start_us"] <= g["end_us"]).all()
            # consecutive sessions separated by MORE than the gap
            nxt = g["start_us"].shift(-1).dropna()
            assert (nxt.to_numpy() - g["end_us"].to_numpy()[:-1]
                    > 1800 * 1_000_000).all(), u

    def test_dedup_normalized_collapses_variants(self, ray_session):
        """Case/punctuation/spacing variants collapse to the min doc_id
        (constructed corpus), and on the SF corpus survivors equal a
        local min-per-digest replay."""
        import hashlib
        import os
        import re

        import pandas as pd
        import pyarrow.parquet as pq

        from kgx.dedup import dedup_normalized

        tmp = "/tmp/kgx_norm_dedup_test"
        os.makedirs(tmp, exist_ok=True)
        pd.DataFrame({
            "doc_id": [0, 1, 2, 3],
            "text": ["Hello,  World!", "hello world", "other doc",
                     "HELLO <world>"],
        }).to_parquet(tmp + "/documents.parquet")
        got = sorted(dedup_normalized(tmp).to_pandas()["doc_id"])
        assert got == [0, 2]
        out = sorted(dedup_normalized(SF).to_pandas()["doc_id"])
        docs = pq.read_table(SF + "/documents.parquet",
                             columns=["doc_id", "text"]).to_pandas()
        norm = docs["text"].map(lambda t: re.sub(
            r" +", " ", re.sub(r"[^a-z0-9 ]", " ", t.lower())).strip())
        dig = norm.map(lambda n: hashlib.md5(n.encode()).hexdigest())
        want = sorted(docs.assign(h=dig).groupby("h")["doc_id"].min())
        assert out == want

    def test_chi2_terms_replays_locally(self, ray_session):
        """χ² cells match a bigint contingency replay, and a term that
        only ever occurs in one language scores higher there than a
        uniformly-spread term does anywhere."""
        import pyarrow.parquet as pq

        from kgx.textops import chi2_terms

        out = chi2_terms(SF)
        docs = pq.read_table(SF + "/documents.parquet",
                             columns=["lang", "text"]).to_pandas()
        ex = docs.assign(tok=docs["text"].str.split(" ")).explode("tok")
        counts = ex.groupby(["lang", "tok"]).size()
        tot = int(counts.sum())
        lt = counts.groupby("lang").sum()
        tt = counts.groupby("tok").sum()
        got = out.set_index(["lang", "tok"])["chi2_q"].to_dict()
        q = 1 << 20
        for (lang, tok), a in counts.items():
            a = int(a); b = int(lt[lang]) - a; c = int(tt[tok]) - a
            d = tot - a - b - c
            den = (a+b)*(c+d)*(a+c)*(b+d)
            want = (q * tot * (a*d - b*c) ** 2) // den if den else 0
            assert got[(lang, tok)] == want, (lang, tok)

    def test_langid_confusion_identities(self, ray_session):
        """Cell counts sum to the corpus size, row sums equal per-lang
        doc counts, and every cell matches a local classify_lang replay
        (the synthetic corpus's lang labels are template-assigned, so
        diagonal dominance is NOT expected here — classifier accuracy
        on real sentences is pinned in test_lang_id_accuracy)."""
        import pyarrow.parquet as pq

        from kgx.textops import classify_lang, langid_confusion

        out = langid_confusion(SF).to_pandas()
        docs = pq.read_table(SF + "/documents.parquet",
                             columns=["lang", "text"]).to_pandas()
        assert out["n"].sum() == len(docs)
        per_lang = docs.groupby("lang").size()
        rows = out.groupby("lang")["n"].sum()
        assert (rows.sort_index() == per_lang.sort_index()).all()
        import pandas as pd
        want = (pd.DataFrame({
            "lang": docs["lang"],
            "lang_pred": [classify_lang(t) for t in docs["text"]]})
            .groupby(["lang", "lang_pred"]).size())
        got = out.set_index(["lang", "lang_pred"])["n"]
        assert got.sort_index().to_dict() == want.sort_index().to_dict()

    def test_moving_sum_and_latest_event_replay_locally(self, ray_session):
        """Bounded-frame window + latest-wins compaction match pandas
        rolling/idxmax replays."""
        import numpy as np
        import pyarrow.parquet as pq

        from kgx.events import latest_event_per_user, moving_sum_3

        ev = pq.read_table(SF + "/events.parquet").to_pandas()
        ev = ev.sort_values(["user_id", "ts", "event_id"])
        ev["vq"] = np.floor(100.0 * ev["value"]).astype("int64")
        want = ev.groupby("user_id")["vq"] \
            .rolling(3, min_periods=1).sum().reset_index(drop=True)
        got = moving_sum_3(SF).to_pandas().set_index("event_id")
        m = dict(zip(ev["event_id"], want.astype("int64")))
        assert got["mov3_q2"].to_dict() == m
        last = ev.groupby("user_id").tail(1)
        lat = latest_event_per_user(SF).to_pandas() \
            .set_index("user_id").sort_index()
        assert list(lat.index) == sorted(last["user_id"])
        assert lat["event_id"].to_dict() == \
            dict(zip(last["user_id"], last["event_id"]))

    def test_fingerprint_overlap_pairs_replays_locally(self, ray_session):
        """The MOSS report equals a local replay over the (already
        independently oracled) winnowing fingerprints."""
        from collections import Counter

        from kgx.dedup import fingerprint_overlap_pairs, \
            winnow_fingerprints

        fps = winnow_fingerprints(SF).to_pandas()
        fpd = fps[["doc_id", "fp"]].drop_duplicates()
        df = fpd.groupby("fp")["doc_id"].apply(list)
        cnt = Counter()
        for docs in df:
            docs = sorted(set(docs))
            if len(docs) < 2 or len(docs) > 32:
                continue
            for i in range(len(docs)):
                for j in range(i + 1, len(docs)):
                    cnt[(docs[i], docs[j])] += 1
        want = {k: v for k, v in cnt.items() if v >= 2}
        out = fingerprint_overlap_pairs(SF).to_pandas()
        got = {(int(a), int(b)): int(n) for a, b, n in
               out[["doc_id_a", "doc_id_b", "n_shared"]]
               .itertuples(index=False)}
        assert got == want

    def test_top_terms_by_lang_replays_locally(self, ray_session):
        """Per-lang top-k equals a local value_counts replay with the
        (n DESC, tok) tie rule."""
        import pyarrow.parquet as pq

        from kgx.textops import top_terms_by_lang

        out = top_terms_by_lang(SF).to_pandas()
        docs = pq.read_table(SF + "/documents.parquet",
                             columns=["lang", "text"]).to_pandas()
        ex = docs.assign(tok=docs["text"].str.split(" ")) \
                 .explode("tok")
        for lang, g in ex.groupby("lang"):
            c = (g.groupby("tok").size().reset_index(name="n")
                 .sort_values(["n", "tok"], ascending=[False, True])
                 .head(10).reset_index(drop=True))
            sub = (out[out["lang"] == lang].sort_values("rank")
                   .reset_index(drop=True))
            assert list(sub["tok"]) == list(c["tok"]), lang
            assert list(sub["n"]) == list(c["n"]), lang

    def test_kmeans_lloyd_replays_locally(self, ray_session):
        """The distributed integer Lloyd loop equals a single-process
        numpy replay, and the integer k-means objective is non-increasing
        across the replayed rounds."""
        import numpy as np
        import pyarrow.parquet as pq

        from kgx.simsearch import kmeans_lloyd

        out = kmeans_lloyd(SF).to_pandas().sort_values("vec_id")
        tbl = pq.read_table(SF + "/embeddings.parquet",
                            columns=["vec_id", "embedding"])
        ids = np.asarray(tbl.column("vec_id"), dtype=np.int64)
        V = np.floor(1024.0 * np.array(tbl.column("embedding").to_pylist(),
                                       dtype=np.float64)).astype(np.int64)
        order = np.argsort(ids)
        C = V[order[:8]].copy()

        def assign(Vq, Cm):
            d2 = ((Vq*Vq).sum(1)[:, None] - 2*(Vq@Cm.T)
                  + (Cm*Cm).sum(1)[None, :])
            return np.argmin(d2, axis=1), d2

        objs = []
        for _ in range(2):
            a, d2 = assign(V, C)
            objs.append(int(d2[np.arange(len(V)), a].sum()))
            for c in range(8):
                m = a == c
                if m.any():
                    C[c] = V[m].sum(axis=0) // int(m.sum())
        a, d2 = assign(V, C)
        objs.append(int(d2[np.arange(len(V)), a].sum()))
        assert objs[0] >= objs[-1]  # Lloyd monotonicity (quantized)
        want = dict(zip(ids.tolist(), a.tolist()))
        got = dict(zip(out["vec_id"], out["cluster"]))
        assert got == want

    def test_msf_boruvka_equals_kruskal_and_spans(self, ray_session):
        """Distributed Borůvka equals a local Kruskal replay (the total
        edge order makes the MSF unique), is acyclic (|E| = |V| − #comp)
        and spans exactly the pair graph's components."""
        from collections import defaultdict

        from kgx.components import msf_boruvka
        from kgx.dedup import jaccard_pairs_sim

        edges = jaccard_pairs_sim(SF).to_pandas()
        out = msf_boruvka(SF).to_pandas()
        e = edges.sort_values(["sim_q", "doc_id_a", "doc_id_b"],
                              ascending=[False, True, True])
        parent = {}

        def find(x):
            while parent.get(x, x) != x:
                x = parent[x]
            return x

        want = []
        for a, b, s in e.itertuples(index=False):
            ra, rb = find(int(a)), find(int(b))
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
                want.append((int(a), int(b), int(s)))
        got = sorted(map(tuple, out[["doc_id_a", "doc_id_b", "sim_q"]]
                         .itertuples(index=False)))
        assert got == sorted(want)
        # the distributed Borůvka rounds produce the identical forest
        # (small_graph_threshold=0 forces them past the Kruskal gate)
        dist = msf_boruvka(SF, small_graph_threshold=0).to_pandas()
        got_d = sorted(map(tuple, dist[["doc_id_a", "doc_id_b", "sim_q"]]
                           .itertuples(index=False)))
        assert got_d == got
        nodes = set(edges["doc_id_a"]) | set(edges["doc_id_b"])
        comps = len({find(int(n)) for n in nodes})
        assert len(out) == len(nodes) - comps
        # spanning: MSF connectivity equals full-graph connectivity
        adj = defaultdict(set)
        for a, b, _ in got:
            adj[a].add(b); adj[b].add(a)
        seen, n_msf_comps = set(), 0
        for n in nodes:
            if n in seen:
                continue
            n_msf_comps += 1
            stack = [n]
            while stack:
                x = stack.pop()
                if x in seen:
                    continue
                seen.add(x)
                stack.extend(adj[x] - seen)
        assert n_msf_comps == comps

    def test_customer_order_counts_outer_semantics(self, ray_session):
        """Every customer appears exactly once; totals match the orders
        table; zero-order customers (the anti-join set) are preserved."""
        import pyarrow.parquet as pq

        from kgx.relational import customer_order_counts

        out = customer_order_counts(SF).to_pandas()
        cust = pq.read_table(SF + "/customer.parquet",
                             columns=["c_custkey"]).to_pandas()
        orders = pq.read_table(SF + "/orders.parquet",
                               columns=["o_custkey"]).to_pandas()
        assert sorted(out["c_custkey"]) == sorted(cust["c_custkey"])
        assert out["n_orders"].sum() == len(orders)
        vc = orders["o_custkey"].value_counts()
        m = out.set_index("c_custkey")["n_orders"]
        for ck in cust["c_custkey"]:
            assert m[ck] == int(vc.get(ck, 0))

    def test_jaccard_pairs_sim_consistency(self, ray_session):
        """Weighted pairs carry the same edge set as jaccard_pairs, and
        every sim_q matches a set replay with sim_q/q >= threshold."""
        from kgx.dedup import jaccard_pairs, jaccard_pairs_sim

        import pyarrow.parquet as pq

        plain = jaccard_pairs(SF).to_pandas()
        sim = jaccard_pairs_sim(SF).to_pandas()
        key = ["doc_id_a", "doc_id_b"]
        assert sorted(map(tuple, plain[key].to_numpy())) == \
            sorted(map(tuple, sim[key].to_numpy()))
        docs = pq.read_table(SF + "/documents.parquet",
                             columns=["doc_id", "text"]).to_pandas()
        toks = {int(d): set(t.split(" "))
                for d, t in zip(docs["doc_id"], docs["text"])}
        q = 1 << 20
        for a, b, s in sim.itertuples(index=False):
            i = len(toks[a] & toks[b])
            u = len(toks[a] | toks[b])
            assert s == (q * i) // u
            assert s >= int(0.8 * q) - 1

    def test_y4m_roundtrip_and_parser_strictness(self, ray_session):
        """encode→decode roundtrips byte-exactly (with zero padding),
        the parser walks FRAME markers with parameters, and non-mono
        streams are rejected."""
        import numpy as np
        import pytest

        from kgx.multimodal import decode_y4m, encode_y4m

        data = bytes(range(200))
        frames = decode_y4m(encode_y4m(data, width=16, height=8))
        assert frames.shape == (2, 8, 16)
        flat = frames.reshape(-1).tobytes()
        assert flat[:200] == data and flat[200:] == b"\x00" * 56
        # FRAME markers may carry parameters up to the newline
        stream = (b"YUV4MPEG2 W2 H2 F25:1 Cmono\n"
                  + b"FRAME Xcustom\n" + bytes([1, 2, 3, 4]))
        f = decode_y4m(stream)
        assert f.shape == (1, 2, 2) and f.sum() == 10
        with pytest.raises(ValueError):
            decode_y4m(b"YUV4MPEG2 W2 H2 C420jpeg\nFRAME\n\x00\x00\x00\x00\x00\x00")
        with pytest.raises(ValueError):
            decode_y4m(b"NOTY4M W2 H2\n")

    def test_value_percentiles_and_hau_replay_locally(self, ray_session):
        """Percentiles match pandas quantile(interpolation='higher'-ish
        discrete rule) and HAU matches a local nunique per hour."""
        import numpy as np
        import pyarrow.parquet as pq

        from kgx.events import hourly_active_users, value_percentiles

        ev = pq.read_table(SF + "/events.parquet").to_pandas()
        out = value_percentiles(SF).to_pandas()
        import math
        for (et, qp), g in out.groupby(["event_type", "q_pct"]):
            c = np.sort(np.floor(
                100.0 * ev.loc[ev["event_type"] == et, "value"]
                .to_numpy(dtype="float64")).astype("int64"))
            want = int(c[math.ceil(qp / 100 * len(c)) - 1])
            assert int(g["value_cents"].iloc[0]) == want, (et, qp)
        hau = hourly_active_users(SF).to_pandas().set_index("hour")
        hours = (ev["ts"].to_numpy().astype("datetime64[h]")
                 .astype("int64"))
        import pandas as pd
        want_h = (pd.DataFrame({"h": hours, "u": ev["user_id"]})
                  .groupby("h")["u"].nunique())
        assert (hau["n_active"].sort_index().to_numpy()
                == want_h.sort_index().to_numpy()).all()

    def test_normalize_text_canonicalization(self, ray_session):
        """Normalization is idempotent-shaped: digests match a local
        replay, lengths shrink or hold, and output charset is clean."""
        import hashlib
        import re

        import pyarrow.parquet as pq

        from kgx.textops import normalize_text

        out = normalize_text(SF).to_pandas().set_index("doc_id")
        docs = pq.read_table(SF + "/documents.parquet",
                             columns=["doc_id", "text"]).to_pandas()
        for d, t in zip(docs["doc_id"], docs["text"]):
            n = re.sub(r" +", " ",
                       re.sub(r"[^a-z0-9 ]", " ", t.lower())).strip()
            assert out.loc[int(d), "norm_md5"] == \
                hashlib.md5(n.encode()).hexdigest()
            assert out.loc[int(d), "n_chars_norm"] == len(n) <= len(t)

    def test_hash_embed_retrieval_replays_locally(self, ray_session):
        """The distributed broadcast-scored top-k equals a local numpy
        replay of chunk → hash-embed → int-dot ranking."""
        import numpy as np
        import pyarrow.parquet as pq

        from kgx.traindata import _hash_embed, hash_embed_retrieval

        out = hash_embed_retrieval(SF).to_pandas()
        docs = pq.read_table(SF + "/documents.parquet",
                             columns=["doc_id", "text"]).to_pandas()
        # local chunking replay (chunk 64 / overlap 8 / stride 56)
        rows = []
        for d, t in zip(docs["doc_id"], docs["text"]):
            toks = t.split(" ")
            n = len(toks)
            kk = max(1, -(-(n - 8) // 56))
            for i in range(kk):
                rows.append((int(d), i,
                             " ".join(toks[i*56:min(i*56+64, n)])))
        import pandas as pd
        ch = pd.DataFrame(rows, columns=["doc_id", "chunk_id", "txt"])
        E = _hash_embed(ch["txt"].tolist())
        qm = ch["doc_id"] % 97 == 0
        want = []
        for qi in np.flatnonzero(qm.to_numpy()):
            dots = E[qi] @ E.T
            m = (ch["doc_id"] != ch["doc_id"].iloc[qi]).to_numpy()
            cand = np.flatnonzero(m)
            order = np.lexsort((ch["chunk_id"].to_numpy()[cand],
                                ch["doc_id"].to_numpy()[cand],
                                -dots[cand]))
            for r, j in enumerate(cand[order[:5]], 1):
                want.append((int(ch["doc_id"].iloc[qi]),
                             int(ch["chunk_id"].iloc[qi]),
                             int(ch["doc_id"].iloc[j]),
                             int(ch["chunk_id"].iloc[j]),
                             int(dots[j]), r))
        got = sorted(map(tuple, out[["q_doc", "q_chunk", "n_doc",
                                     "n_chunk", "dot", "rank"]]
                         .itertuples(index=False)))
        assert got == sorted(want)

    def test_degree_assortativity_replays_locally(self, ray_session):
        """Sufficient statistics match an adjacency replay, and the
        derived Pearson r lands in [-1, 1]."""
        from collections import defaultdict

        from kgx.components import degree_assortativity_sums
        from kgx.dedup import jaccard_pairs

        edges = jaccard_pairs(SF).to_pandas()
        deg = defaultdict(int)
        for a, b in zip(edges["doc_id_a"], edges["doc_id_b"]):
            deg[int(a)] += 1; deg[int(b)] += 1
        out = degree_assortativity_sums(SF).to_pandas().iloc[0]
        n = s = ss = sp = 0
        for a, b in zip(edges["doc_id_a"], edges["doc_id_b"]):
            dx, dy = deg[int(a)], deg[int(b)]
            n += 2; s += dx + dy; ss += dx*dx + dy*dy; sp += 2*dx*dy
        assert (out["n_ends"], out["s_d"], out["s_dd"], out["s_prod"]) \
            == (n, s, ss, sp)
        num = out["n_ends"] * out["s_prod"] - out["s_d"] ** 2
        den = out["n_ends"] * out["s_dd"] - out["s_d"] ** 2
        assert den > 0 and -1.0 <= num / den <= 1.0

    def test_pivot_counts_crosstab_identities(self, ray_session):
        """Row sums equal per-source totals; column sums equal per-lang
        totals — the two marginal identities of a crosstab."""
        import pyarrow.parquet as pq

        from kgx.textops import pivot_counts

        out = pivot_counts(SF).to_pandas().set_index("source")
        docs = pq.read_table(SF + "/documents.parquet",
                             columns=["source", "lang"]).to_pandas()
        per_src = docs.groupby("source").size()
        assert (out.sum(axis=1).sort_index() == per_src.sort_index()).all()
        per_lang = docs.groupby("lang").size()
        for lang, n in per_lang.items():
            col = "n_%s" % lang
            assert col in out.columns and out[col].sum() == n
        assert out["n_other"].sum() == 0

    def test_ewma_user_value_replays_locally(self, ray_session):
        """The distributed position-vectorized walk equals a plain
        per-user sequential replay of s_i = (s_{i-1} + v_i) // 2."""
        import pyarrow.parquet as pq

        from kgx.events import ewma_user_value

        out = ewma_user_value(SF).to_pandas().set_index("event_id")
        ev = pq.read_table(SF + "/events.parquet").to_pandas()
        ev = ev.sort_values(["user_id", "ts", "event_id"])
        import numpy as np
        want = {}
        for _, g in ev.groupby("user_id"):
            s = None
            for _, r in g.iterrows():
                v = int(np.floor(100.0 * r["value"]))
                s = v if s is None else (s + v) // 2
                want[int(r["event_id"])] = s
        got = out["ewma_q"].to_dict()
        assert got == want

    def test_token_entropy_bounds_and_extremes(self, ray_session):
        """H = (nlogn_q − slogc_q)/(q·N) reconstructs per-doc entropy:
        0 ≤ H ≤ ln(N) (+quantization slack), an all-identical-token doc
        scores ~0 and an all-distinct doc scores ~ln(N)."""
        import numpy as np

        from kgx.textops import token_entropy

        df = token_entropy(SF).to_pandas()
        q = float(1 << 20)
        H = (df["nlogn_q"] - df["slogc_q"]) / (q * df["n_tokens"])
        lnN = np.log(df["n_tokens"].to_numpy(dtype="float64"))
        eps = 1e-4
        assert (H >= -eps).all()
        assert (H <= lnN + eps).all()
        # independent float recompute agrees within quantization error
        import pandas as pd
        import pyarrow.parquet as pq
        docs = pq.read_table(SF + "/documents.parquet",
                             columns=["doc_id", "text"]).to_pandas()
        row = docs.iloc[0]
        toks = row["text"].split(" ")
        c = pd.Series(toks).value_counts().to_numpy(dtype="float64")
        n = float(len(toks))
        want = np.log(n) - float((c * np.log(c)).sum()) / n
        got = float(H[df["doc_id"] == row["doc_id"]].iloc[0])
        assert abs(got - want) < 1e-4

    def test_hll_user_counts_accuracy(self, ray_session):
        """Per-group HLL estimates land within 20% of the exact distinct
        user count for every event type (m=256 → ~6.5% typical error)."""
        import pyarrow.parquet as pq

        from kgx.traindata import hll_user_counts

        out = hll_user_counts(SF).set_index("event_type")
        ev = pq.read_table(SF + "/events.parquet",
                           columns=["event_type", "user_id"]).to_pandas()
        exact = ev.groupby("event_type")["user_id"].nunique()
        assert set(out.index) == set(exact.index)
        for et, true in exact.items():
            est = out.loc[et, "est_distinct"]
            assert abs(est - true) <= max(3, 0.2 * true), (et, est, true)

    def test_zscore_quality_statistics(self, ray_session):
        """Quantized z-scores match a local float replay and per-lang
        standardized columns have (approximately) zero mean and the
        right extreme ordering."""
        import pyarrow.parquet as pq

        from kgx.textops import zscore_quality

        out = zscore_quality(SF).to_pandas()
        docs = pq.read_table(SF + "/documents.parquet",
                             columns=["doc_id", "lang", "text"]).to_pandas()
        x = docs["text"].str.split(" ").str.len().astype("int64")
        z = out.set_index("doc_id")["z_q"] / (1 << 20)
        for lang, g in docs.assign(x=x).groupby("lang"):
            zz = z.loc[g["doc_id"]].to_numpy()
            if g["x"].nunique() > 1:
                assert abs(zz.mean()) < 0.01, lang
                assert abs(zz.std() - 1.0) < 0.05, lang
                # extreme docs map to extreme z
                assert z.loc[g.loc[g["x"].idxmax(), "doc_id"]] == zz.max()
            else:
                assert (zz == 0).all(), lang

    def test_source_roundtrips_lossless_and_sharded(self, ray_session):
        """NDJSON and CSV export→re-ingest reproduce every document
        byte-exactly (md5 parity with the parquet source) and the sink
        writes per-block shard files."""
        import hashlib
        import os

        import pyarrow.parquet as pq

        from kgx.sources import csv_roundtrip, ndjson_roundtrip, \
            _roundtrip_dir

        docs = pq.read_table(SF + "/documents.parquet",
                             columns=["doc_id", "text"]).to_pandas()
        want = {int(d): hashlib.md5(t.encode()).hexdigest()
                for d, t in zip(docs["doc_id"], docs["text"])}
        for fn, fmt in ((ndjson_roundtrip, "ndjson"), (csv_roundtrip,
                                                       "csv")):
            out = fn(SF).to_pandas()
            got = dict(zip(out["doc_id"].astype(int), out["text_md5"]))
            assert got == want, fmt
            shards = os.listdir(_roundtrip_dir(SF, fmt))
            assert len(shards) >= 1, fmt

    def test_big_orders_replays_locally(self, ray_session):
        """Q18-shape HAVING semi-join matches an independent pandas
        replay (per-order integral quantity totals over the threshold)."""
        import pyarrow.parquet as pq

        from kgx.relational import big_orders

        out = big_orders(SF, min_qty=150).to_pandas()
        li = pq.read_table(SF + "/lineitem.parquet",
                           columns=["l_orderkey", "l_quantity"]).to_pandas()
        tot = li.assign(q=li["l_quantity"].astype("int64")) \
                .groupby("l_orderkey")["q"].sum()
        big = tot[tot > 150]
        assert set(out["o_orderkey"]) == set(big.index)
        m = out.set_index("o_orderkey")["total_qty"]
        assert (m.sort_index() == big.sort_index()).all()
        # every surviving order appears exactly once
        assert out["o_orderkey"].is_unique

    def test_clustering_coeff_replays_locally(self, ray_session):
        """Per-node (deg, n_tri) matches an independent adjacency-set
        replay of the jaccard_pairs graph, and the global identities
        hold (Σ n_tri = 3·n_triangles, Σ deg = 2·|E|)."""
        from collections import defaultdict

        from kgx.components import clustering_coeff, triangle_count
        from kgx.dedup import jaccard_pairs

        edges = jaccard_pairs(SF).to_pandas()
        adj = defaultdict(set)
        for a, b in zip(edges["doc_id_a"], edges["doc_id_b"]):
            adj[int(a)].add(int(b)); adj[int(b)].add(int(a))
        out = clustering_coeff(SF)
        out = (out.to_pandas() if hasattr(out, "to_pandas")
               else out).set_index("node")
        assert set(out.index) == set(adj)
        for n, nbrs in adj.items():
            assert out.loc[n, "deg"] == len(nbrs)
            tri = sum(len(adj[m] & nbrs) for m in nbrs) // 2
            assert out.loc[n, "n_tri"] == tri, n
        total = int(triangle_count(SF).to_pandas()["n_triangles"].iloc[0])
        assert out["n_tri"].sum() == 3 * total
        assert out["deg"].sum() == 2 * len(edges)

    def test_vocab_growth_curve_identities(self, ray_session):
        """Final checkpoint equals the global corpus totals, and both
        curves are monotone non-decreasing (a vocabulary never shrinks)."""
        import pyarrow.parquet as pq

        from kgx.textops import vocab_growth

        df = vocab_growth(SF)
        docs = pq.read_table(SF + "/documents.parquet",
                             columns=["text"]).to_pandas()
        toks = docs["text"].str.split(" ").explode()
        assert len(df) == 10
        assert df["n_tokens"].iloc[-1] == len(toks)
        assert df["n_distinct"].iloc[-1] == toks.nunique()
        assert df["n_tokens"].is_monotonic_increasing
        assert df["n_distinct"].is_monotonic_increasing
        # Heaps sublinearity: distinct grows slower than tokens
        assert df["n_distinct"].iloc[-1] < df["n_tokens"].iloc[-1]

    def test_local_supplier_volume_replays_locally(self, ray_session):
        """Q5-shape six-table join matches an independent pandas replay
        (same per-line-item quantization rule)."""
        import numpy as np
        import pyarrow.parquet as pq

        from kgx.relational import local_supplier_volume

        out = local_supplier_volume(SF)
        t = {n: pq.read_table(f"{SF}/{n}.parquet").to_pandas()
             for n in ["region", "nation", "customer", "orders",
                       "lineitem", "supplier"]}
        rk = set(t["region"].loc[t["region"]["r_name"] == "ASIA",
                                 "r_regionkey"])
        nat = t["nation"][t["nation"]["n_regionkey"].isin(rk)]
        m = (t["lineitem"]
             .merge(t["supplier"], left_on="l_suppkey",
                    right_on="s_suppkey")
             .merge(t["orders"], left_on="l_orderkey",
                    right_on="o_orderkey")
             .merge(t["customer"], left_on="o_custkey",
                    right_on="c_custkey")
             .merge(nat, left_on="s_nationkey", right_on="n_nationkey"))
        m = m[(m["c_nationkey"] == m["s_nationkey"])
              & (m["o_orderdate"] >= "1995-01-01")
              & (m["o_orderdate"] < "1996-01-01")]
        rev = np.floor(100.0 * (m["l_extendedprice"].to_numpy()
                                * (1.0 - m["l_discount"].to_numpy())))
        ref = (m.assign(rev=rev.astype("int64"))
               .groupby("n_name")["rev"].sum().to_dict())
        assert dict(zip(out["n_name"], out["revenue_q2"])) == ref

    def test_dedup_substrings_replays_locally(self, ray_session):
        """The exact-substring rewrite matches an independent local
        replay (Counter over all 8-token windows, coverage sets)."""
        from collections import Counter

        import pyarrow.parquet as pq

        from kgx.textops import dedup_substrings

        out = dedup_substrings(SF).to_pandas()
        docs = pq.read_table(SF + "/documents.parquet",
                             columns=["doc_id", "text"]).to_pandas()
        toks = {int(d): t.split(" ")
                for d, t in zip(docs["doc_id"], docs["text"])}
        wins = {d: [" ".join(t[i:i + 8]) for i in range(len(t) - 7)]
                for d, t in toks.items()}
        cnt = Counter(w for ws in wins.values() for w in ws)
        ref = {}
        for d, t in toks.items():
            covered = set()
            for s, w in enumerate(wins[d]):
                if cnt[w] >= 2:
                    covered.update(range(s, s + 8))
            ref[d] = " ".join(x for i, x in enumerate(t)
                              if i not in covered)
        got = dict(zip(out["doc_id"].astype(int), out["text_dedup"]))
        assert got == ref
        # the rewrite bites on this corpus (templated docs share spans)
        assert any(got[d] != " ".join(t) for d, t in toks.items())
        assert any(got[d] == " ".join(t) for d, t in toks.items())


class TestMarkovTransitions:
    def test_transitions_replay_locally(self, ray_session):
        """Global transition counts equal a per-user shift replay, and
        the marginal identity holds: sum of transitions = events - users
        (each user's stream of k events yields k-1 transitions)."""
        import pyarrow.parquet as pq

        from kgx.events import markov_transitions

        ev = pq.read_table(SF + "/events.parquet",
                           columns=["event_id", "user_id", "ts",
                                    "event_type"]).to_pandas()
        ev = ev.sort_values(["user_id", "ts", "event_id"])
        prev = ev.groupby("user_id")["event_type"].shift()
        loc = ev.assign(prev_type=prev).dropna(subset=["prev_type"])
        want = (loc.groupby(["prev_type", "event_type"]).size()
                .to_dict())
        out = markov_transitions(SF).to_pandas()
        got = {(p, n): int(c) for p, n, c in
               out[["prev_type", "next_type", "n"]].itertuples(index=False)}
        assert got == want
        assert out["n"].sum() == len(ev) - ev["user_id"].nunique()


class TestCooccurrencePairs:
    def test_pairs_replay_locally(self, ray_session):
        """Frequent co-purchase pairs equal a local distinct self-join
        replay; symmetry invariant part_a < part_b holds."""
        from collections import Counter
        from itertools import combinations

        import pyarrow.parquet as pq

        from kgx.relational import cooccurrence_pairs

        li = pq.read_table(SF + "/lineitem.parquet",
                           columns=["l_orderkey", "l_partkey"]).to_pandas()
        cnt = Counter()
        for _, g in li.drop_duplicates().groupby("l_orderkey"):
            for a, b in combinations(sorted(g["l_partkey"]), 2):
                cnt[(a, b)] += 1
        want = {k: v for k, v in cnt.items() if v >= 2}
        out = cooccurrence_pairs(SF).to_pandas()
        assert (out["part_a"] < out["part_b"]).all()
        got = {(int(a), int(b)): int(n) for a, b, n in
               out[["part_a", "part_b", "n_orders"]].itertuples(index=False)}
        assert got == want


class TestLateOrders:
    def test_exists_semantics_replay(self, ray_session):
        """EXISTS(line shipped >60d late) equals the per-order max
        replay; count totals match orders with any late line."""
        import pandas as pd
        import pyarrow.parquet as pq

        from kgx.relational import late_orders_by_priority

        li = pq.read_table(SF + "/lineitem.parquet",
                           columns=["l_orderkey", "l_shipdate"]).to_pandas()
        o = pq.read_table(SF + "/orders.parquet").to_pandas()
        mx = li.groupby("l_orderkey", as_index=False)["l_shipdate"].max()
        m = o.merge(mx, left_on="o_orderkey", right_on="l_orderkey")
        late = m[(m["l_shipdate"] - m["o_orderdate"])
                 > pd.Timedelta(days=60)]
        want = late.groupby("o_orderpriority").size().to_dict()
        out = late_orders_by_priority(SF).to_pandas()
        got = dict(zip(out["o_orderpriority"], out["n_late"].astype(int)))
        assert got == want


class TestNoOrdersCustomers:
    def test_q22_replay_locally(self, ray_session):
        """Threshold + anti-join + regroup equals a local replay in
        exact integer cents."""
        import numpy as np
        import pandas as pd
        import pyarrow.parquet as pq

        from kgx.relational import no_orders_customers

        c = pq.read_table(SF + "/customer.parquet").to_pandas()
        o = pq.read_table(SF + "/orders.parquet").to_pandas()
        bal = np.floor(100.0 * c["c_acctbal"] + 0.5).astype("int64")
        pos = bal[bal > 0]
        s, n = int(pos.sum()), len(pos)
        recent = set(o.loc[o["o_orderdate"] >= pd.Timestamp("2000-06-01"),
                           "o_custkey"])
        keep = (bal * n > s) & ~c["c_custkey"].isin(recent)
        d = c[keep].assign(bal=bal[keep])
        want = d.groupby("c_nationkey").agg(
            n_cust=("c_custkey", "size"), sum_bal=("bal", "sum"))
        out = no_orders_customers(SF).to_pandas() \
            .set_index("nationkey").sort_index()
        assert out["n_cust"].to_dict() == \
            {int(k): int(v) for k, v in want["n_cust"].items()}
        assert out["sum_bal_q2"].to_dict() == \
            {int(k): int(v) for k, v in want["sum_bal"].items()}


class TestTopSupplier:
    def test_q15_replay_locally(self, ray_session):
        """Max-of-aggregate winners equal a local integer-revenue
        replay (ALL ties included)."""
        import numpy as np
        import pyarrow.parquet as pq

        from kgx.relational import top_supplier

        li = pq.read_table(SF + "/lineitem.parquet").to_pandas()
        cents = np.floor(100.0 * li["l_extendedprice"] + 0.5).astype("int64")
        disc = np.floor(100.0 * li["l_discount"] + 0.5).astype("int64")
        rev = (li.assign(rev=cents * (100 - disc))
               .groupby("l_suppkey")["rev"].sum())
        winners = set(rev[rev == rev.max()].index)
        out = top_supplier(SF).to_pandas()
        assert set(out["s_suppkey"]) == winners
        assert (out["total_revenue_u"] == int(rev.max())).all()
        sup = pq.read_table(SF + "/supplier.parquet").to_pandas()
        names = dict(zip(sup["s_suppkey"], sup["s_name"]))
        assert all(names[k] == n for k, n in
                   zip(out["s_suppkey"], out["s_name"]))


class TestArgmaxAndPromo:
    def test_top_supplier_per_part_replay(self, ray_session):
        """Per-part argmax equals a local replay with the
        (qty DESC, suppkey ASC) tie rule."""
        import pyarrow.parquet as pq

        from kgx.relational import top_supplier_per_part

        li = pq.read_table(SF + "/lineitem.parquet").to_pandas()
        g = (li.assign(q=li["l_quantity"].astype("int64"))
             .groupby(["l_partkey", "l_suppkey"], as_index=False)["q"]
             .sum()
             .sort_values(["l_partkey", "q", "l_suppkey"],
                          ascending=[True, False, True]))
        top = g.groupby("l_partkey", as_index=False).head(1)
        out = top_supplier_per_part(SF).to_pandas() \
            .sort_values("p_partkey").reset_index(drop=True)
        assert list(out["p_partkey"]) == list(top["l_partkey"])
        assert list(out["top_suppkey"]) == list(top["l_suppkey"])
        assert list(out["total_qty"]) == list(top["q"])

    def test_promo_revenue_identities(self, ray_session):
        """Scalar ratio row: promo ≤ total, ratio = floor(1e6·p/t),
        and totals equal the local integer replay."""
        import numpy as np
        import pyarrow.parquet as pq

        from kgx.relational import promo_revenue

        out = promo_revenue(SF)
        p, t, r = (int(out["promo_rev_u"][0]), int(out["total_rev_u"][0]),
                   int(out["promo_ratio_q6"][0]))
        assert 0 <= p <= t and r == 10**6 * p // t
        li = pq.read_table(SF + "/lineitem.parquet").to_pandas()
        pt = pq.read_table(SF + "/part.parquet").to_pandas()
        cents = np.floor(100.0 * li["l_extendedprice"] + 0.5).astype("int64")
        disc = np.floor(100.0 * li["l_discount"] + 0.5).astype("int64")
        li = li.assign(rev=cents * (100 - disc)).merge(
            pt[["p_partkey", "p_type"]],
            left_on="l_partkey", right_on="p_partkey")
        assert t == int(li["rev"].sum())
        assert p == int(li.loc[li["p_type"].str.startswith("PROMO"),
                               "rev"].sum())


class TestPartsSupplierCounts:
    def test_q16_replay_locally(self, ray_session):
        """Distinct-supplier counts with exclusion equal a local
        merge + nunique replay."""
        import pyarrow.parquet as pq

        from kgx.relational import parts_supplier_counts

        li = pq.read_table(SF + "/lineitem.parquet").to_pandas()
        pt = pq.read_table(SF + "/part.parquet").to_pandas()
        sup = pq.read_table(SF + "/supplier.parquet").to_pandas()
        bad = set(sup.loc[sup["s_acctbal"] < 0, "s_suppkey"])
        m = (li[~li["l_suppkey"].isin(bad)]
             .merge(pt[["p_partkey", "p_brand", "p_size"]],
                    left_on="l_partkey", right_on="p_partkey"))
        want = (m.groupby(["p_brand", "p_size"])["l_suppkey"]
                .nunique().to_dict())
        out = parts_supplier_counts(SF).to_pandas()
        got = {(b, int(s)): int(n) for b, s, n in
               out[["p_brand", "p_size", "supplier_cnt"]]
               .itertuples(index=False)}
        assert got == want


class TestLinregTokens:
    def test_ols_matches_numpy(self, ray_session):
        """The integer-quantized closed form agrees with numpy's
        float lstsq fit to within one quantization step."""
        import numpy as np
        import pyarrow.parquet as pq

        from kgx.textops import linreg_tokens

        out = linreg_tokens(SF)
        d = pq.read_table(SF + "/documents.parquet").to_pandas()
        x = d["n_chars"].to_numpy(dtype="float64")
        y = (d["text"].str.count(" ") + 1).to_numpy(dtype="float64")
        slope, intercept = np.polyfit(x, y, 1)
        assert abs(int(out["slope_q6"][0]) - 10**6 * slope) < 10.0
        assert abs(int(out["intercept_q6"][0]) - 10**6 * intercept) < 10.0
        assert int(out["n_docs"][0]) == len(d)
        assert int(out["sy"][0]) == int(y.sum())


class TestOovRate:
    def test_oov_replay_locally(self, ray_session):
        """Per-lang OOV counts equal a local split/set replay."""
        import pyarrow.parquet as pq

        from kgx.textops import oov_rate

        d = pq.read_table(SF + "/documents.parquet").to_pandas()
        vocab = set()
        for t in d.loc[d["doc_id"] % 2 == 0, "text"]:
            vocab.update(t.split(" "))
        want = {}
        for lang, text in d.loc[d["doc_id"] % 2 == 1,
                                ["lang", "text"]].itertuples(index=False):
            toks = text.split(" ")
            nt, no = want.get(lang, (0, 0))
            want[lang] = (nt + len(toks),
                          no + sum(1 for t in toks if t not in vocab))
        out = oov_rate(SF).to_pandas()
        got = {l: (int(nt), int(no)) for l, nt, no in
               out[["lang", "n_tokens", "n_oov"]].itertuples(index=False)}
        assert got == want
        assert (out["oov_q6"] ==
                10**6 * out["n_oov"] // out["n_tokens"]).all()


class TestNaiveBayesLangid:
    def test_nb_predicts_odd_split_above_chance(self, ray_session):
        """Predictions cover exactly the odd split, draw only train
        langs, and beat uniform chance (the synthetic corpus's text
        depends on lang only weakly, so the pin is conservative)."""
        import pyarrow.parquet as pq

        from kgx.traindata import naive_bayes_langid

        out = naive_bayes_langid(SF).to_pandas()
        d = pq.read_table(SF + "/documents.parquet").to_pandas()
        odd = set(d.loc[d["doc_id"] % 2 == 1, "doc_id"])
        assert set(out["doc_id"]) == odd
        train_langs = set(d.loc[d["doc_id"] % 2 == 0, "lang"])
        assert set(out["nb_pred"]) <= train_langs
        m = out.merge(d[["doc_id", "lang"]], on="doc_id")
        acc = (m["nb_pred"] == m["lang"]).mean()
        assert acc > 1.0 / len(train_langs)


class TestBfsDistances:
    def test_bfs_paths_agree_and_replay(self, ray_session):
        """Single-task gate and the distributed level loop are
        row-identical, and both equal a local deque BFS replay over the
        symmetrized knn edges."""
        from collections import deque

        from kgx.components import bfs_distances
        from kgx.simsearch import knn_graph

        fast = bfs_distances(SF).to_pandas() \
            .sort_values("vec_id").reset_index(drop=True)
        dist = bfs_distances(SF, small_graph_threshold=0).to_pandas() \
            .sort_values("vec_id").reset_index(drop=True)
        assert fast.equals(dist)

        e = knn_graph(SF).to_pandas()
        adj: dict = {}
        for a, b in zip(e["vec_id"], e["neighbor_id"]):
            adj.setdefault(int(a), set()).add(int(b))
            adj.setdefault(int(b), set()).add(int(a))
        seeds = sorted(v for v in adj if v % 97 == 0)
        d = {s: 0 for s in seeds}
        q = deque(seeds)
        while q:
            u = q.popleft()
            for v in adj[u]:
                if v not in d:
                    d[v] = d[u] + 1
                    q.append(v)
        got = dict(zip(fast["vec_id"], fast["dist"]))
        assert got == d


class TestSkylineParts:
    def test_skyline_replay_locally(self, ray_session):
        """The distributed skyline-of-skylines equals a brute-force
        O(n²) dominance replay."""
        import numpy as np
        import pyarrow.parquet as pq

        from kgx.relational import skyline_parts

        p = pq.read_table(SF + "/part.parquet").to_pandas()
        price = np.floor(100.0 * p["p_retailprice"] + 0.5).astype("int64")
        size = p["p_size"].astype("int64")
        keep = []
        for i in range(len(p)):
            dom = ((price <= price[i]) & (size >= size[i])
                   & ((price < price[i]) | (size > size[i]))).any()
            if not dom:
                keep.append(int(p["p_partkey"].iloc[i]))
        out = skyline_parts(SF)
        assert sorted(out["p_partkey"]) == sorted(keep)


class TestUserPaths:
    def test_paths_replay_locally(self, ray_session):
        """Ordered path strings equal a per-user sorted-join replay,
        and path length matches n_events."""
        import pyarrow.parquet as pq

        from kgx.events import user_paths

        ev = pq.read_table(SF + "/events.parquet").to_pandas() \
            .sort_values(["user_id", "ts", "event_id"])
        want = (ev.groupby("user_id")["event_type"]
                .apply(">".join).to_dict())
        out = user_paths(SF).to_pandas()
        got = dict(zip(out["user_id"], out["path"]))
        assert got == want
        assert (out["path"].str.count(">") + 1 == out["n_events"]).all()


class TestDocRankByLength:
    def test_rank_replay_locally(self, ray_session):
        """Counting-sort ranks equal pandas rank(method='min') per
        lang; rank bounds and tie-sharing hold."""
        import pyarrow.parquet as pq

        from kgx.textops import doc_rank_by_length

        d = pq.read_table(SF + "/documents.parquet").to_pandas()
        want = (d.groupby("lang")["n_chars"].rank(method="min")
                .astype("int64"))
        out = doc_rank_by_length(SF).to_pandas().set_index("doc_id")
        got = out.loc[d["doc_id"], "rnk"].to_numpy()
        assert (got == want.to_numpy()).all()
        assert (out.groupby("lang")["n_lang"].first()
                == d.groupby("lang").size()).all()


class TestLabelCentroids:
    def test_centroid_sums_replay(self, ray_session):
        """Per-label quantized component sums equal a numpy replay;
        counts are constant across dims of one label."""
        import numpy as np
        import pyarrow.parquet as pq

        from kgx.simsearch import label_centroids

        t = pq.read_table(SF + "/embeddings.parquet").to_pandas()
        V = np.floor(1024.0 * np.array(t["embedding"].tolist(),
                                       dtype=np.float64)).astype("int64")
        out = label_centroids(SF)
        for lab in sorted(t["label"].unique()):
            s = V[t["label"].to_numpy() == lab].sum(axis=0)
            o = out[out["label"] == lab].sort_values("dim")
            assert (o["sum_q"].to_numpy() == s).all()
            assert (o["n"] == (t["label"] == lab).sum()).all()


class TestProfileColumns:
    def test_profile_replay_locally(self, ray_session):
        """Per-column profile equals pandas count/isna/nunique."""
        import pyarrow.parquet as pq

        from kgx.relational import profile_columns

        o = pq.read_table(SF + "/orders.parquet").to_pandas()
        out = profile_columns(SF).set_index("col")
        assert set(out.index) == set(o.columns)
        for c in o.columns:
            assert out.loc[c, "n_rows"] == len(o)
            assert out.loc[c, "n_null"] == int(o[c].isna().sum())
            assert out.loc[c, "n_distinct"] == o[c].nunique()


class TestBipartiteConflicts:
    def test_conflicts_replay_locally(self, ray_session):
        """Edge/conflict counts equal a local BFS-parity replay over
        the deduped undirected knn edges."""
        from kgx.components import bfs_distances, bipartite_conflicts
        from kgx.simsearch import knn_graph

        e = knn_graph(SF).to_pandas()
        und = set()
        for a, b in zip(e["vec_id"], e["neighbor_id"]):
            und.add((min(int(a), int(b)), max(int(a), int(b))))
        d = bfs_distances(SF).to_pandas()
        par = dict(zip(d["vec_id"], d["dist"] % 2))
        conf = sum(1 for a, b in und
                   if a in par and b in par and par[a] == par[b])
        out = bipartite_conflicts(SF)
        assert int(out["n_edges"][0]) == len(und)
        assert int(out["n_conflicts"][0]) == conf


class TestAbTestZstat:
    def test_welch_matches_scipyless_replay(self, ray_session):
        """Sufficient statistics equal a local replay and floor(1e6·z)
        matches the same float tree computed from them."""
        import math

        import numpy as np
        import pyarrow.parquet as pq

        from kgx.events import ab_test_zstat

        ev = pq.read_table(SF + "/events.parquet").to_pandas()
        cents = np.floor(100.0 * ev["value"] + 0.5).astype("int64")
        a = (ev["user_id"] % 2) == 0
        out = ab_test_zstat(SF)
        na, nb = int(a.sum()), int((~a).sum())
        assert int(out["n_a"][0]) == na and int(out["n_b"][0]) == nb
        s1a, s2a = int(cents[a].sum()), int((cents[a]**2).sum())
        s1b, s2b = int(cents[~a].sum()), int((cents[~a]**2).sum())
        assert (int(out["s1_a"][0]), int(out["s2_a"][0])) == (s1a, s2a)
        va = (s2a - s1a * s1a / na) / (na - 1)
        vb = (s2b - s1b * s1b / nb) / (nb - 1)
        z = (s1a / na - s1b / nb) / math.sqrt(va / na + vb / nb)
        assert int(out["z_q6"][0]) == math.floor(1e6 * z)


class TestLateEvents:
    def test_watermark_replay_locally(self, ray_session):
        """Late counts equal a local single-thread watermark replay
        over the md5 arrival order, and both classes are populated."""
        import hashlib

        import numpy as np
        import pandas as pd
        import pyarrow.parquet as pq

        from kgx.events import late_events

        ev = pq.read_table(SF + "/events.parquet").to_pandas()
        ev["k"] = [int(hashlib.md5(("arr:%d" % i).encode())
                       .hexdigest()[:16], 16)
                   for i in ev["event_id"]]
        ev["us"] = (ev["ts"] - pd.Timestamp(0)) \
            // pd.Timedelta(microseconds=1)
        ev = ev.sort_values(["k", "event_id"]).reset_index(drop=True)
        us = ev["us"].to_numpy("int64")
        wm = np.empty(len(us))
        wm[0] = -np.inf
        wm[1:] = np.maximum.accumulate(us)[:-1]
        late = us < wm - 300 * 10**6
        want = (ev.assign(late=late).groupby("event_type")
                .agg(n_late=("late", "sum"), n_total=("late", "size")))
        out = late_events(SF).set_index("event_type")
        assert out["n_late"].to_dict() == \
            {k: int(v) for k, v in want["n_late"].items()}
        assert out["n_total"].to_dict() == \
            {k: int(v) for k, v in want["n_total"].items()}
        assert 0 < out["n_late"].sum() < out["n_total"].sum()


class TestDivisionAndCube:
    def test_division_replay_locally(self, ray_session):
        """FOR-ALL division equals a local set-intersection replay."""
        import pyarrow.parquet as pq

        from kgx.textops import division_tokens

        d = pq.read_table(SF + "/documents.parquet").to_pandas()
        per_lang = {}
        for lang, text in d[["lang", "text"]].itertuples(index=False):
            per_lang.setdefault(lang, set()).update(text.split(" "))
        want = set.intersection(*per_lang.values())
        out = division_tokens(SF).to_pandas()
        assert set(out["tok"]) == want

    def test_cube_identities(self, ray_session):
        """CUBE cells satisfy the lattice identities: detail sums to
        each margin, margins sum to the grand total."""
        from kgx.textops import cube_stats

        c = cube_stats(SF).to_pandas()
        grand = c[(c["lang"] == "*") & (c["source"] == "*")]
        detail = c[(c["lang"] != "*") & (c["source"] != "*")]
        bylang = c[(c["lang"] != "*") & (c["source"] == "*")]
        bysrc = c[(c["lang"] == "*") & (c["source"] != "*")]
        for col in ["n_docs", "sum_chars"]:
            assert detail[col].sum() == int(grand[col].iloc[0])
            assert bylang[col].sum() == int(grand[col].iloc[0])
            assert bysrc[col].sum() == int(grand[col].iloc[0])
        g = detail.groupby("lang")["n_docs"].sum().to_dict()
        assert g == dict(zip(bylang["lang"], bylang["n_docs"]))


class TestScc:
    def test_scc_paths_agree_and_invariants(self, ray_session):
        """Kosaraju gate and the forward-backward elimination loop are
        row-identical; labels are canonical member minima and members
        of a sampled SCC are mutually reachable."""
        from collections import deque

        from kgx.components import scc
        from kgx.simsearch import knn_graph

        fast = scc(SF).to_pandas().sort_values("vec_id") \
            .reset_index(drop=True)
        dist = scc(SF, small_graph_threshold=0).to_pandas() \
            .sort_values("vec_id").reset_index(drop=True)
        assert fast.equals(dist)
        g = fast.groupby("scc_id")["vec_id"].agg(list)
        for sid, members in g.items():
            assert min(members) == sid
        e = knn_graph(SF).to_pandas()
        adj = {}
        for a, b in zip(e["vec_id"], e["neighbor_id"]):
            adj.setdefault(int(a), []).append(int(b))

        def reaches(s, t):
            seen, q = {s}, deque([s])
            while q:
                u = q.popleft()
                if u == t:
                    return True
                for w in adj.get(u, ()):
                    if w not in seen:
                        seen.add(w)
                        q.append(w)
            return s == t

        big = max(g.items(), key=lambda kv: len(kv[1]))[1][:8]
        for u in big:
            assert reaches(u, big[0]) and reaches(big[0], u)


class TestQ21AndDailyDelta:
    def test_wait_chain_replay_locally(self, ray_session):
        """Sole-late-shipper counts equal a local per-order replay."""
        import pandas as pd
        import pyarrow.parquet as pq

        from kgx.relational import wait_chain_suppliers

        li = pq.read_table(SF + "/lineitem.parquet").to_pandas()
        o = pq.read_table(SF + "/orders.parquet").to_pandas()
        m = li.merge(o[["o_orderkey", "o_orderdate"]],
                     left_on="l_orderkey", right_on="o_orderkey")
        m["late"] = (m["l_shipdate"] - m["o_orderdate"]) \
            > pd.Timedelta(days=90)
        pairs = (m.groupby(["l_orderkey", "l_suppkey"], as_index=False)
                 ["late"].max())
        agg = pairs.groupby("l_orderkey").agg(
            n_supp=("l_suppkey", "size"), n_late=("late", "sum"))
        pairs = pairs.join(agg, on="l_orderkey")
        keep = pairs[pairs["late"] & (pairs["n_supp"] > 1)
                     & (pairs["n_late"] == 1)]
        want = keep.groupby("l_suppkey").size().to_dict()
        out = wait_chain_suppliers(SF)
        got = dict(zip(out["s_suppkey"], out["n_orders"].astype(int)))
        assert got == want

    def test_daily_delta_identities(self, ray_session):
        """First day per type has delta 0; deltas telescope to
        last − first."""
        from kgx.events import daily_type_delta

        t = daily_type_delta(SF)
        for _, g in t.groupby("event_type"):
            g = g.sort_values("day")
            assert int(g["delta_q2"].iloc[0]) == 0
            assert int(g["delta_q2"].sum()) == \
                int(g["rev_q2"].iloc[-1]) - int(g["rev_q2"].iloc[0])


class TestSubtreeAndUnpivot:
    def test_subtree_sizes_replay(self, ray_session):
        """Subtree sizes equal a local chain-walk replay, and the root
        counts every other node."""
        import pyarrow.parquet as pq

        from kgx.components import kg_subtree_sizes

        ids = pq.read_table(SF + "/documents.parquet",
                            columns=["doc_id"]).to_pandas()["doc_id"]
        want = {}
        for d in ids:
            v = int(d)
            while v > 0:
                v //= 2
                want[v] = want.get(v, 0) + 1
        out = kg_subtree_sizes(SF).to_pandas()
        got = dict(zip(out["ancestor"], out["n_descendants"]))
        assert got == want
        assert got[0] == len(ids) - 1

    def test_unpivot_long_form(self, ray_session):
        """Melt emits exactly 3 rows per doc and values re-pivot to the
        wide metrics."""
        from kgx.textops import quality, unpivot_quality

        long = unpivot_quality(SF).to_pandas()
        wide = quality(SF).to_pandas()
        assert len(long) == 3 * len(wide)
        p = long.pivot(index="doc_id", columns="metric",
                       values="value")
        w = wide.set_index("doc_id")
        for c in ["n_chars", "n_tokens", "n_uniq_tokens"]:
            assert p[c].sort_index().equals(w[c].sort_index())


class TestTypoPairs:
    def test_ed1_helper_cases(self, ray_session):
        from kgx.dedup import _ed_le1

        assert _ed_le1("bolt", "belt")      # substitution
        assert _ed_le1("bolt", "bolts")     # insertion
        assert _ed_le1("bolt", "blt")       # deletion
        assert _ed_le1("bolt", "bolt")      # equal
        assert not _ed_le1("bolt", "beet")  # two substitutions
        assert not _ed_le1("bolt", "boltss")

    def test_pairs_replay_locally(self, ray_session):
        """SymSpell blocking + verify equals the brute-force distance
        replay over the full vocabulary."""
        import pyarrow.parquet as pq

        from kgx.dedup import _ed_le1, typo_pairs

        names = sorted(pq.read_table(SF + "/customer.parquet",
                                     columns=["c_name"])
                       .to_pandas()["c_name"].unique())
        want = {(a, b) for i, a in enumerate(names)
                for b in names[i + 1:] if _ed_le1(a, b)}
        out = typo_pairs(SF).to_pandas()
        got = {(a, b) for a, b in
               out[["name_a", "name_b"]].itertuples(index=False)}
        assert got == want

    def test_many_partitions_empty_verify_groups(self, ray_session):
        """nparts >> vocabulary forces bucket groups whose candidates
        ALL fail the exact verify — the empty boolean mask must stay a
        mask (dtype=bool), not degrade to column-label selection
        (regression: KeyError name_x at 32 CPUs)."""
        from kgx.dedup import typo_pairs

        wide = typo_pairs(SF, num_partitions=64).to_pandas()
        base = typo_pairs(SF).to_pandas()
        key = lambda d: sorted(map(tuple, d.values.tolist()))
        assert key(wide) == key(base)


class TestMadChars:
    def test_mad_replay_locally(self, ray_session):
        """Histogram-derived median/MAD equal a sorted-array replay
        with the lower-median rule."""
        import numpy as np
        import pyarrow.parquet as pq

        from kgx.textops import mad_chars

        d = pq.read_table(SF + "/documents.parquet").to_pandas()
        out = mad_chars(SF).set_index("lang")
        for lang, g in d.groupby("lang"):
            s = np.sort(g["n_chars"].to_numpy("int64"))
            med = int(s[(len(s) - 1) // 2])
            dev = np.sort(np.abs(s - med))
            mad = int(dev[(len(dev) - 1) // 2])
            assert int(out.loc[lang, "median_chars"]) == med
            assert int(out.loc[lang, "mad_chars"]) == mad


class TestSurvivorshipWinsorChecksum:
    def test_dedup_keep_best_policy(self, ray_session):
        """Survivor per normalized group is the longest doc (ties to
        min id), replayed locally."""
        import pyarrow.parquet as pq
        import re

        from kgx.dedup import dedup_keep_best

        d = pq.read_table(SF + "/documents.parquet").to_pandas()
        norm = (d["text"].str.lower()
                .str.replace(re.compile(r"[^a-z0-9 ]"), " ", regex=True)
                .str.replace(re.compile(r" +"), " ", regex=True)
                .str.strip(" "))
        t = d.assign(norm=norm).sort_values(
            ["norm", "n_chars", "doc_id"],
            ascending=[True, False, True])
        want = set(t.groupby("norm").head(1)["doc_id"])
        got = set(dedup_keep_best(SF).to_pandas()["doc_id"])
        assert got == want

    def test_winsorize_band(self, ray_session):
        """Clipped values sit inside the exact [p05, p95] band and
        agree with numpy clipping at the quantile_disc cutpoints."""
        import numpy as np
        import pyarrow.parquet as pq

        from kgx.events import winsorize_values

        ev = pq.read_table(SF + "/events.parquet").to_pandas()
        c = np.sort(np.floor(100.0 * ev["value"] + 0.5).astype("int64"))
        n = len(c)
        plo = int(c[int(np.ceil(0.05 * n)) - 1])
        phi = int(c[int(np.ceil(0.95 * n)) - 1])
        out = winsorize_values(SF).to_pandas()
        assert out["value_wins_q2"].min() >= plo
        assert out["value_wins_q2"].max() <= phi
        assert (out["value_wins_q2"]
                == out["value_q2"].clip(plo, phi)).all()

    def test_table_checksums_detect_changes(self, ray_session):
        """Checksums replay locally and flip under any row change."""
        import hashlib

        import numpy as np
        import pyarrow.parquet as pq

        from kgx.relational import table_checksums

        out = table_checksums(SF).set_index("tbl")
        d = pq.read_table(SF + "/orders.parquet").to_pandas()
        s = (d["o_orderkey"].astype("int64").astype(str) + "|"
             + np.floor(100.0 * d["o_totalprice"] + 0.5)
             .astype("int64").astype(str))
        acc = sum(int(hashlib.md5(r.encode()).hexdigest()[:16], 16)
                  for r in s) % (1 << 63)
        assert int(out.loc["orders", "checksum"]) == acc
        assert int(out.loc["orders", "n_rows"]) == len(d)
        # any single-row perturbation flips the sum
        first = int(hashlib.md5(s.iloc[0].encode()).hexdigest()[:16],
                    16)
        assert (acc - first) % (1 << 63) != acc


class TestGiniValues:
    def test_gini_replay_and_bounds(self, ray_session):
        """Histogram Gini equals the sorted-rank replay and sits in
        [0, 1)."""
        import numpy as np
        import pyarrow.parquet as pq

        from kgx.events import gini_values

        ev = pq.read_table(SF + "/events.parquet").to_pandas()
        c = np.sort(np.floor(100.0 * ev["value"] + 0.5).astype("int64"))
        n = len(c)
        sw = int((np.arange(1, n + 1, dtype=object) * c).sum())
        s = int(c.sum())
        want = (10**6 * (2 * sw - (n + 1) * s)) // (n * s)
        out = gini_values(SF)
        assert int(out["gini_q6"][0]) == want
        assert 0 <= want < 10**6
        assert int(out["n"][0]) == n and int(out["sum_q2"][0]) == s


class TestInterarrival:
    def test_gap_percentiles_replay(self, ray_session):
        """Histogram percentiles equal a sorted-gap replay per type."""
        import numpy as np
        import pyarrow.parquet as pq

        from kgx.events import interarrival_percentiles

        ev = pq.read_table(SF + "/events.parquet").to_pandas() \
            .sort_values(["user_id", "event_type", "ts", "event_id"])
        same = (ev["user_id"].eq(ev["user_id"].shift())
                & ev["event_type"].eq(ev["event_type"].shift()))
        import pandas as pd
        gap = (ev["ts"] - ev["ts"].shift()) \
            // pd.Timedelta(microseconds=1)
        t = ev.assign(gap=gap)[same.to_numpy()]
        out = interarrival_percentiles(SF).set_index("event_type")
        for et, g in t.groupby("event_type"):
            s = np.sort(g["gap"].to_numpy("int64"))
            n = len(s)
            p50 = int(s[int(np.ceil(0.5 * n)) - 1])
            p95 = int(s[int(np.ceil(0.95 * n)) - 1])
            assert int(out.loc[et, "p50_us"]) == p50
            assert int(out.loc[et, "p95_us"]) == p95


class TestShareAndGrowth:
    def test_revenue_share_replay(self, ray_session):
        """Shares replay locally and sum to ≈ 1e6 (floor slack)."""
        import numpy as np
        import pyarrow.parquet as pq

        from kgx.relational import nation_revenue_share

        o = pq.read_table(SF + "/orders.parquet").to_pandas()
        c = pq.read_table(SF + "/customer.parquet").to_pandas()
        n = pq.read_table(SF + "/nation.parquet").to_pandas()
        m = o.merge(c, left_on="o_custkey", right_on="c_custkey")
        m["rev"] = np.floor(100.0 * m["o_totalprice"] + 0.5) \
            .astype("int64")
        g = m.groupby("c_nationkey")["rev"].sum()
        names = dict(zip(n["n_nationkey"], n["n_name"]))
        want = {names[k]: int(v) for k, v in g.items()}
        out = nation_revenue_share(SF)
        assert dict(zip(out["n_name"], out["rev_q2"])) == want
        total = sum(want.values())
        assert (out["share_q6"]
                == [10**6 * want[x] // total for x in out["n_name"]]) \
            .all()
        assert 10**6 - len(want) <= out["share_q6"].sum() <= 10**6

    def test_cumulative_users_identity(self, ray_session):
        """n_cumulative telescopes n_new and ends at the distinct-user
        count."""
        import pyarrow.parquet as pq

        from kgx.events import cumulative_users_by_day

        ev = pq.read_table(SF + "/events.parquet").to_pandas()
        out = cumulative_users_by_day(SF)
        assert int(out["n_new"].sum()) == ev["user_id"].nunique()
        assert (out["n_cumulative"] == out["n_new"].cumsum()).all()
        assert out["day"].is_monotonic_increasing


class TestClosureGate:
    def test_gate_equals_distributed(self, ray_session):
        """Single-task path-doubling gate and the distributed loop
        produce identical closures (int and string node ids)."""
        import pandas as pd
        import ray.data

        from kgx.components import transitive_closure

        e = ray.data.from_pandas(pd.DataFrame({
            "a": ["u1", "u2", "u3", "u5"],
            "b": ["u2", "u3", "u4", "u6"]}))
        fast = transitive_closure(e).to_pandas() \
            .sort_values(["a", "b"]).reset_index(drop=True)
        dist = transitive_closure(e, small_graph_threshold=0) \
            .to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
        assert fast.equals(dist)
        got = {(a, b) for a, b in fast.itertuples(index=False)}
        assert ("u1", "u4") in got and ("u5", "u6") in got
        assert ("u1", "u6") not in got


class TestDupGroupSpectrum:
    def test_spectrum_replay_and_mass(self, ray_session):
        """Spectrum equals a local count-of-counts replay and its mass
        Σ size·n_groups equals the corpus size; a constructed corpus
        with planted duplicates produces the right multi-way bins."""
        import re
        from collections import Counter

        import pyarrow.parquet as pq

        from kgx.dedup import dup_group_spectrum

        d = pq.read_table(SF + "/documents.parquet").to_pandas()
        norm = (d["text"].str.lower()
                .str.replace(re.compile(r"[^a-z0-9 ]"), " ", regex=True)
                .str.replace(re.compile(r" +"), " ", regex=True)
                .str.strip(" "))
        sizes = Counter(Counter(norm).values())
        out = dup_group_spectrum(SF)
        got = dict(zip(out["group_size"], out["n_groups"]))
        assert got == dict(sizes)
        assert sum(s * n for s, n in got.items()) == len(d)


class TestAboveAvgOrders:
    def test_correlated_filter_replay(self, ray_session):
        """Counts equal a local integer replay; single-order customers
        report 0 above-average orders."""
        import numpy as np
        import pyarrow.parquet as pq

        from kgx.relational import above_avg_orders

        o = pq.read_table(SF + "/orders.parquet").to_pandas()
        cents = np.floor(100.0 * o["o_totalprice"] + 0.5).astype("int64")
        t = o.assign(cents=cents)
        agg = t.groupby("o_custkey").agg(n=("cents", "size"),
                                         s=("cents", "sum"))
        m = t.join(agg, on="o_custkey")
        m["above"] = m["cents"] * m["n"] > m["s"]
        want = m.groupby("o_custkey").agg(
            n_above=("above", "sum"), n_orders=("above", "size"))
        out = above_avg_orders(SF).to_pandas() \
            .set_index("o_custkey").sort_index()
        assert out["n_above"].to_dict() == \
            {int(k): int(v) for k, v in want["n_above"].items()}
        single = out[out["n_orders"] == 1]
        assert (single["n_above"] == 0).all()


class TestContainmentPairs:
    def test_containment_replay_and_asymmetry(self, ray_session):
        """Ordered pairs equal a local replay; containment is a
        superset of the symmetric Jaccard edges (J ≥ t ⇒ both
        containments ≥ t)."""
        from itertools import combinations

        import pyarrow.parquet as pq

        from kgx.dedup import containment_pairs, jaccard_pairs_sim

        d = pq.read_table(SF + "/documents.parquet").to_pandas()
        sets = {int(i): set(t.split(" ")) for i, t in
                zip(d["doc_id"], d["text"])}
        blocks = {}
        for i, t in zip(d["doc_id"], d["text"]):
            blocks.setdefault(t.split(" ")[0], []).append(int(i))
        want = set()
        for ids in blocks.values():
            for i, j in combinations(sorted(ids), 2):
                inter = len(sets[i] & sets[j])
                for a, b in ((i, j), (j, i)):
                    if inter / len(sets[a]) >= 0.8:
                        want.add((a, b))
        out = containment_pairs(SF).to_pandas()
        got = {(int(a), int(b)) for a, b in
               out[["doc_id_src", "doc_id_dst"]].itertuples(index=False)}
        assert got == want
        jac = jaccard_pairs_sim(SF).to_pandas()
        for a, b in jac[["doc_id_a", "doc_id_b"]].itertuples(index=False):
            assert (int(a), int(b)) in got and (int(b), int(a)) in got


class TestArrowIpcRoundtrip:
    def test_ipc_roundtrip_lossless(self, ray_session):
        """Feather shards re-ingest losslessly: digests equal the
        direct-parquet digests and shard files exist on disk."""
        import glob
        import hashlib

        import pyarrow.parquet as pq

        from kgx.sources import _roundtrip_dir, arrow_ipc_roundtrip

        out = arrow_ipc_roundtrip(SF).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        d = pq.read_table(SF + "/documents.parquet").to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        assert list(out["doc_id"]) == list(d["doc_id"])
        want = [hashlib.md5(t.encode()).hexdigest() for t in d["text"]]
        assert list(out["text_md5"]) == want
        shards = glob.glob(_roundtrip_dir(SF, "ipc") + "/*.arrow")
        assert len(shards) >= 1


class TestForecastRevenue:
    def test_q6_replay(self, ray_session):
        """Matches a local integer replay with the same predicates."""
        import numpy as np
        import pyarrow.parquet as pq

        from kgx.relational import forecast_revenue

        li = pq.read_table(SF + "/lineitem.parquet").to_pandas()
        pct = np.floor(100.0 * li["l_discount"] + 0.5).astype("int64")
        cents = np.floor(
            100.0 * li["l_extendedprice"] + 0.5).astype("int64")
        m = ((li["l_shipdate"] >= "1996-01-01")
             & (li["l_shipdate"] < "1997-01-01")
             & (li["l_quantity"] < 24)
             & (pct >= 5) & (pct <= 7))
        want = int((cents[m] * pct[m]).sum())
        out = forecast_revenue(SF)
        assert int(out["revenue_q4"].iloc[0]) == want
        assert want > 0  # the window actually selects rows at sf0.001


class TestSmallQtyRevenue:
    def test_q17_replay(self, ray_session):
        """Matches a local replay of the multiplied-out fraction
        filter; the filter strictly shrinks revenue."""
        import numpy as np
        import pyarrow.parquet as pq

        from kgx.relational import small_qty_revenue

        import pandas as pd

        li = pq.read_table(SF + "/lineitem.parquet").to_pandas()
        t = pd.DataFrame({
            "k": li["l_partkey"].astype("int64"),
            "qty": li["l_quantity"].astype("int64"),
            "cents": np.floor(100.0 * li["l_extendedprice"] + 0.5)
            .astype("int64")})
        agg = t.groupby("k").agg(n=("qty", "size"), s=("qty", "sum"))
        m = t.join(agg, on="k")
        keep = 5 * m["qty"] * m["n"] < m["s"]
        want = int(m["cents"][keep].sum()) // 7
        out = small_qty_revenue(SF)
        assert int(out["rev_per_year_cents"].iloc[0]) == want
        assert keep.sum() < len(m)


class TestOrderCountDistribution:
    def test_q13_spectrum_identities(self, ray_session):
        """Spectrum equals a local LEFT-JOIN replay; masses add up to
        the customer count and the zero bucket equals the anti-join."""
        import pyarrow.parquet as pq

        from kgx.relational import order_count_distribution

        o = pq.read_table(SF + "/orders.parquet").to_pandas()
        c = pq.read_table(SF + "/customer.parquet").to_pandas()
        cnt = o.groupby("o_custkey").size()
        n = cnt.reindex(c["c_custkey"]).fillna(0).astype("int64")
        want = n.value_counts().to_dict()
        out = order_count_distribution(SF)
        got = dict(zip(out["n_orders"], out["n_customers"]))
        assert got == {int(k): int(v) for k, v in want.items()}
        assert sum(got.values()) == len(c)
        zero = len(set(c["c_custkey"]) - set(o["o_custkey"]))
        assert got.get(0, 0) == zero


class TestImportantParts:
    def test_q11_global_threshold_replay(self, ray_session):
        """Survivors equal a local replay of v > total//2000 and the
        output is bounded by 2000 rows by construction."""
        import pandas as pd
        import pyarrow.parquet as pq

        from kgx.relational import important_parts

        li = pq.read_table(SF + "/lineitem.parquet").to_pandas()
        v = pd.DataFrame({
            "k": li["l_partkey"].astype("int64"),
            "v": (np.floor(100.0 * li["l_extendedprice"] + 0.5)
                  .astype("int64")
                  * li["l_quantity"].astype("int64"))})
        agg = v.groupby("k")["v"].sum()
        want = agg[agg > int(agg.sum()) // 2000]
        out = important_parts(SF).to_pandas()
        got = dict(zip(out["p_partkey"], out["value_cents"]))
        assert got == {int(k): int(x) for k, x in want.items()}
        assert len(out) <= 2000


class TestShipDelayPriority:
    def test_q12_band_replay(self, ray_session):
        """Band × priority counts equal a local merge replay, and the
        line mass is conserved."""
        import pandas as pd
        import pyarrow.parquet as pq

        from kgx.relational import ship_delay_priority

        li = pq.read_table(SF + "/lineitem.parquet").to_pandas()
        o = pq.read_table(SF + "/orders.parquet").to_pandas()
        m = li[["l_orderkey", "l_shipdate"]].merge(
            o[["o_orderkey", "o_orderdate", "o_orderpriority"]],
            left_on="l_orderkey", right_on="o_orderkey")
        d_us = (m["l_shipdate"].astype("datetime64[us]").astype("int64")
                - m["o_orderdate"].astype("datetime64[us]")
                .astype("int64"))
        band = np.minimum(np.maximum(d_us, 0) // (86400 * 10**6) // 30,
                          4)
        hi = m["o_orderpriority"].isin(["1-URGENT", "2-HIGH"])
        want = pd.crosstab(band, hi)
        out = ship_delay_priority(SF)
        for _, r in out.iterrows():
            b = int(r["delay_band"])
            w_hi = int(want.loc[b, True]) if True in want.columns else 0
            w_lo = int(want.loc[b, False]) if False in want.columns else 0
            assert int(r["n_high_lines"]) == w_hi
            assert int(r["n_low_lines"]) == w_lo
        assert int(out["n_high_lines"].sum()
                   + out["n_low_lines"].sum()) == len(li)


class TestReturnedTopCustomers:
    def test_q10_topk_replay(self, ray_session):
        """Top-20 equals a local replay under the (rev DESC, custkey)
        total order; output is exactly k rows and sorted."""
        import pandas as pd
        import pyarrow.parquet as pq

        from kgx.relational import returned_top_customers

        li = pq.read_table(SF + "/lineitem.parquet").to_pandas()
        o = pq.read_table(SF + "/orders.parquet").to_pandas()
        r = li[li["l_returnflag"] == "R"].copy()
        rev = (np.floor(100.0 * r["l_extendedprice"] + 0.5)
               .astype("int64")
               * (100 - np.floor(100.0 * r["l_discount"] + 0.5)
                  .astype("int64")))
        t = pd.DataFrame({"k": r["l_orderkey"].astype("int64"),
                          "rev": rev})
        ok = o[(o["o_orderdate"] >= "1996-01-01")
               & (o["o_orderdate"] < "1996-04-01")]
        m = t.merge(ok[["o_orderkey", "o_custkey"]],
                    left_on="k", right_on="o_orderkey")
        cr = m.groupby("o_custkey")["rev"].sum().reset_index()
        cr = cr.sort_values(["rev", "o_custkey"],
                            ascending=[False, True]).head(20)
        out = returned_top_customers(SF)
        assert list(out["c_custkey"]) == list(cr["o_custkey"])
        assert list(out["rev_q4"]) == list(cr["rev"])
        assert len(out) == 20
        assert (out["rev_q4"].diff().dropna() <= 0).all()


class TestVolumeShipping:
    def test_q7_replay_and_symmetry(self, ray_session):
        """Cells equal a local three-way-join replay; both directions
        of the nation pair appear and same-nation cells are excluded."""
        import pandas as pd
        import pyarrow.parquet as pq

        from kgx.relational import volume_shipping

        li = pq.read_table(SF + "/lineitem.parquet").to_pandas()
        o = pq.read_table(SF + "/orders.parquet").to_pandas()
        c = pq.read_table(SF + "/customer.parquet").to_pandas()
        s = pq.read_table(SF + "/supplier.parquet").to_pandas()
        n = pq.read_table(SF + "/nation.parquet").to_pandas()
        pair = sorted(set(s["s_nationkey"].astype(int)))[:2]
        li = li[(li["l_shipdate"] >= "1995-01-01")
                & (li["l_shipdate"] < "1997-01-01")]
        m = (li.merge(s[["s_suppkey", "s_nationkey"]],
                      left_on="l_suppkey", right_on="s_suppkey")
             .merge(o[["o_orderkey", "o_custkey"]],
                    left_on="l_orderkey", right_on="o_orderkey")
             .merge(c[["c_custkey", "c_nationkey"]],
                    left_on="o_custkey", right_on="c_custkey"))
        m = m[m["s_nationkey"].isin(pair) & m["c_nationkey"].isin(pair)
              & (m["s_nationkey"] != m["c_nationkey"])]
        rev = (np.floor(100.0 * m["l_extendedprice"] + 0.5)
               .astype("int64")
               * (100 - np.floor(100.0 * m["l_discount"] + 0.5)
                  .astype("int64")))
        yr = m["l_shipdate"].dt.year.astype("int64")
        nm = dict(zip(n["n_nationkey"], n["n_name"]))
        want = (pd.DataFrame({
            "supp_nation": m["s_nationkey"].map(nm),
            "cust_nation": m["c_nationkey"].map(nm),
            "l_year": yr, "rev": rev})
            .groupby(["supp_nation", "cust_nation", "l_year"])["rev"]
            .sum())
        out = volume_shipping(SF)
        got = {(r["supp_nation"], r["cust_nation"], int(r["l_year"])):
               int(r["revenue_q4"]) for _, r in out.iterrows()}
        assert got == {k: int(v) for k, v in want.items()}
        dirs = set(zip(out["supp_nation"], out["cust_nation"]))
        assert len(dirs) == 2  # both directions, no same-nation cells


class TestPromoPartSuppliers:
    def test_q20_threshold_replay(self, ray_session):
        """Winners equal a local replay of the 10%-of-part-total rule
        restricted to PROMO parts."""
        import pandas as pd
        import pyarrow.parquet as pq

        from kgx.relational import promo_part_suppliers

        li = pq.read_table(SF + "/lineitem.parquet").to_pandas()
        p = pq.read_table(SF + "/part.parquet").to_pandas()
        s = pq.read_table(SF + "/supplier.parquet").to_pandas()
        lq = (pd.DataFrame({
            "k": li["l_partkey"], "s": li["l_suppkey"],
            "q": li["l_quantity"].astype("int64")})
            .groupby(["k", "s"], as_index=False)["q"].sum())
        tot = lq.groupby("k")["q"].sum()
        promo = set(p.loc[p["p_type"] == "PROMO", "p_partkey"])
        t = tot.reindex(lq["k"]).to_numpy()
        win = lq[(10 * lq["q"] > t) & lq["k"].isin(promo)]
        want = sorted(set(win["s"].astype(int)))
        out = promo_part_suppliers(SF)
        assert list(out["s_suppkey"]) == want
        nm = dict(zip(s["s_suppkey"], s["s_name"]))
        assert list(out["s_name"]) == [nm[k] for k in want]
        assert len(want) > 0  # non-vacuous at sf0.001


class TestMarketShare:
    def test_q8_replay_and_ratio(self, ray_session):
        """Year cells equal a local five-way-join replay; share_ppm is
        the exact integer ratio of the two emitted sums."""
        import pandas as pd
        import pyarrow.parquet as pq

        from kgx.relational import market_share

        li = pq.read_table(SF + "/lineitem.parquet").to_pandas()
        o = pq.read_table(SF + "/orders.parquet").to_pandas()
        c = pq.read_table(SF + "/customer.parquet").to_pandas()
        s = pq.read_table(SF + "/supplier.parquet").to_pandas()
        n = pq.read_table(SF + "/nation.parquet").to_pandas()
        p = pq.read_table(SF + "/part.parquet").to_pandas()
        NAT = int(s["s_nationkey"].min())
        REG = int(n.loc[n["n_nationkey"] == NAT, "n_regionkey"]
                  .iloc[0])
        rn = set(n.loc[n["n_regionkey"] == REG, "n_nationkey"]
                 .astype(int))
        o = o[(o["o_orderdate"] >= "1996-01-01")
              & (o["o_orderdate"] < "1998-01-01")]
        m = (li.merge(p.loc[p["p_type"] == "ECONOMY", ["p_partkey"]],
                      left_on="l_partkey", right_on="p_partkey")
             .merge(s[["s_suppkey", "s_nationkey"]],
                    left_on="l_suppkey", right_on="s_suppkey")
             .merge(o[["o_orderkey", "o_custkey", "o_orderdate"]],
                    left_on="l_orderkey", right_on="o_orderkey")
             .merge(c[["c_custkey", "c_nationkey"]],
                    left_on="o_custkey", right_on="c_custkey"))
        m = m[m["c_nationkey"].astype(int).isin(rn)]
        rev = (np.floor(100.0 * m["l_extendedprice"] + 0.5)
               .astype("int64")
               * (100 - np.floor(100.0 * m["l_discount"] + 0.5)
                  .astype("int64")))
        yr = m["o_orderdate"].dt.year.astype("int64")
        nat = rev * (m["s_nationkey"].to_numpy() == NAT)
        want = pd.DataFrame({"yr": yr, "rev": rev, "nat": nat}) \
            .groupby("yr")[["rev", "nat"]].sum()
        out = market_share(SF)
        got = {int(r["o_year"]): (int(r["total_q4"]),
                                  int(r["nation_q4"]))
               for _, r in out.iterrows()}
        assert got == {int(y): (int(v["rev"]), int(v["nat"]))
                       for y, v in want.iterrows()}
        for _, r in out.iterrows():
            assert int(r["share_ppm"]) == (
                1000000 * int(r["nation_q4"])) // int(r["total_q4"])
            assert 0 <= int(r["share_ppm"]) <= 1000000


class TestProductProfit:
    def test_q9_replay_and_sign(self, ray_session):
        """Nation/year profit equals a local replay with retail price
        as unit cost; losses (negative cells) are representable."""
        import pandas as pd
        import pyarrow.parquet as pq

        from kgx.relational import product_profit

        li = pq.read_table(SF + "/lineitem.parquet").to_pandas()
        o = pq.read_table(SF + "/orders.parquet").to_pandas()
        s = pq.read_table(SF + "/supplier.parquet").to_pandas()
        n = pq.read_table(SF + "/nation.parquet").to_pandas()
        p = pq.read_table(SF + "/part.parquet").to_pandas()
        p = p[p["p_name"].str.contains("gear", regex=False)]
        m = (li.merge(p[["p_partkey", "p_retailprice"]],
                      left_on="l_partkey", right_on="p_partkey")
             .merge(s[["s_suppkey", "s_nationkey"]],
                    left_on="l_suppkey", right_on="s_suppkey")
             .merge(o[["o_orderkey", "o_orderdate"]],
                    left_on="l_orderkey", right_on="o_orderkey")
             .merge(n[["n_nationkey", "n_name"]],
                    left_on="s_nationkey", right_on="n_nationkey"))
        rev = (np.floor(100.0 * m["l_extendedprice"] + 0.5)
               .astype("int64")
               * (100 - np.floor(100.0 * m["l_discount"] + 0.5)
                  .astype("int64")))
        cost = (np.floor(100.0 * m["p_retailprice"] + 0.5)
                .astype("int64") * 100
                * m["l_quantity"].astype("int64"))
        want = pd.DataFrame({
            "n_name": m["n_name"].astype(str),
            "o_year": m["o_orderdate"].dt.year.astype("int64"),
            "profit": rev - cost}) \
            .groupby(["n_name", "o_year"])["profit"].sum()
        out = product_profit(SF)
        got = {(r["n_name"], int(r["o_year"])): int(r["profit_q4"])
               for _, r in out.iterrows()}
        assert got == {k: int(v) for k, v in want.items()}
        assert len(out) > 0


class TestBrandQtyRevenue:
    def test_q19_disjunction_replay(self, ray_session):
        """The scalar equals a local replay of the three predicate
        bands; rows outside every band contribute nothing."""
        import pyarrow.parquet as pq

        from kgx.relational import brand_qty_revenue

        li = pq.read_table(SF + "/lineitem.parquet").to_pandas()
        p = pq.read_table(SF + "/part.parquet").to_pandas()
        m = li.merge(p[["p_partkey", "p_brand", "p_size"]],
                     left_on="l_partkey", right_on="p_partkey")
        q = m["l_quantity"].astype("int64")
        sz = m["p_size"].astype("int64")
        b = m["p_brand"].astype(str)
        hit = (((b == "Brand#12") & sz.between(1, 5)
                & q.between(1, 11))
               | ((b == "Brand#23") & sz.between(1, 10)
                  & q.between(10, 20))
               | ((b == "Brand#34") & sz.between(1, 15)
                  & q.between(20, 30)))
        rev = (np.floor(100.0 * m["l_extendedprice"] + 0.5)
               .astype("int64")
               * (100 - np.floor(100.0 * m["l_discount"] + 0.5)
                  .astype("int64")))
        out = brand_qty_revenue(SF)
        assert int(out["revenue_q4"].iloc[0]) == int(rev[hit].sum())


class TestAdamicAdar:
    def test_scores_match_networkx_style_replay(self, ray_session):
        """Scores equal a local adjacency-set replay of the integer
        Adamic–Adar formula, and no predicted pair is an edge."""
        from collections import defaultdict

        from kgx.components import adamic_adar
        from kgx.dedup import jaccard_pairs

        edges = jaccard_pairs(SF, 0.8).to_pandas()
        adj = defaultdict(set)
        for a, b in zip(edges["doc_id_a"], edges["doc_id_b"]):
            adj[int(a)].add(int(b)); adj[int(b)].add(int(a))
        want = defaultdict(int)
        for x, nb in adj.items():
            if len(nb) < 2:
                continue
            wq = 10**12 // int(np.floor(1e6 * np.log(len(nb))))
            nbs = sorted(nb)
            for i in range(len(nbs)):
                for j in range(i + 1, len(nbs)):
                    want[(nbs[i], nbs[j])] += wq
        eset = {(min(int(a), int(b)), max(int(a), int(b)))
                for a, b in zip(edges["doc_id_a"], edges["doc_id_b"])}
        want = {k: v for k, v in want.items() if k not in eset}
        out = adamic_adar(SF)
        got = {(int(r["doc_id_a"]), int(r["doc_id_b"])):
               int(r["score_q"]) for _, r in out.iterrows()}
        assert got == want
        assert not (set(got) & eset)
        assert len(got) > 0


class TestIntegrityAudit:
    def test_detects_planted_violations(self, ray_session, tmp_path):
        """On a corpus with a planted PK duplicate and FK orphan the
        audit reports exactly those counts; on the clean corpus every
        n_bad is zero and n_rows pins the table sizes."""
        import shutil

        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        from kgx.relational import integrity_audit

        out = integrity_audit(SF)
        audit = dict(zip(out["check"],
                         zip(out["n_rows"], out["n_bad"])))
        assert len(audit) == 14
        assert all(int(b) == 0 for _, b in audit.values())
        n_orders = len(pq.read_table(SF + "/orders.parquet"))
        assert int(audit["pk_orders"][0]) == n_orders
        assert int(audit["fk_lineitem_orders"][0]) == len(
            pq.read_table(SF + "/lineitem.parquet"))

        # plant one duplicate orderkey and one orphan lineitem
        bad = str(tmp_path / "bad")
        shutil.copytree(SF, bad)
        o = pq.read_table(bad + "/orders.parquet").to_pandas()
        o = pd.concat([o, o.iloc[[0]]], ignore_index=True)
        pq.write_table(pa.Table.from_pandas(o, preserve_index=False),
                       bad + "/orders.parquet")
        li = pq.read_table(bad + "/lineitem.parquet").to_pandas()
        li.loc[li.index[-1], "l_orderkey"] = 10**12  # no such order
        pq.write_table(pa.Table.from_pandas(li, preserve_index=False),
                       bad + "/lineitem.parquet")
        out2 = integrity_audit(bad)
        a2 = dict(zip(out2["check"], out2["n_bad"]))
        assert int(a2["pk_orders"]) == 1
        assert int(a2["fk_lineitem_orders"]) == 1
        # the duplicated order also duplicates one parent key — child
        # rows still resolve, so no other check moves
        assert sum(int(v) for v in a2.values()) == 2


class TestDenseDailyCounts:
    def test_grid_dense_and_mass_preserving(self, ray_session):
        """The grid is |types|·|days| complete; zero-filled cells add
        no mass (total equals the event count)."""
        import pyarrow.parquet as pq

        from kgx.events import dense_daily_counts

        out = dense_daily_counts(SF)
        ev = pq.read_table(SF + "/events.parquet",
                           columns=["event_type"]).to_pandas()
        types = set(ev["event_type"])
        days = out["day"].unique()
        assert len(out) == len(types) * len(days)
        assert (np.diff(np.sort(days)) == 1).all()  # no day gaps
        assert int(out["n_events"].sum()) == len(ev)

    def test_sparse_series_gets_filled(self, ray_session, tmp_path):
        """A constructed corpus with a quiet middle day and a type
        missing from one day gets explicit zero cells."""
        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        from kgx.events import dense_daily_counts

        day = 86_400_000_000
        rows = pd.DataFrame({
            "event_id": [1, 2, 3],
            "ts": pd.to_datetime([0 * day, 0 * day, 2 * day],
                                 unit="us"),
            "user_id": [1, 2, 1],
            "event_type": ["view", "click", "view"],
            "value": [1.0, 1.0, 1.0], "props": ["{}"] * 3})
        d = str(tmp_path)
        pq.write_table(pa.Table.from_pandas(rows,
                                            preserve_index=False),
                       d + "/events.parquet")
        out = dense_daily_counts(d)
        cells = {(r["event_type"], int(r["day"])): int(r["n_events"])
                 for _, r in out.iterrows()}
        assert len(cells) == 6  # 2 types × 3 days, day 1 filled in
        assert cells[("view", 1)] == 0 and cells[("click", 1)] == 0
        assert cells[("click", 2)] == 0  # type absent from a live day
        assert cells[("view", 0)] == 1 and cells[("view", 2)] == 1


class TestScd2Intervals:
    def test_intervals_partition_each_user_timeline(self, ray_session):
        """Per user: intervals chain (to == next from), exactly one
        open sentinel row, from < to everywhere."""
        from kgx.events import scd2_intervals

        SENT = 4102444800000000
        df = scd2_intervals(SF).to_pandas()
        assert (df["valid_from_us"] < df["valid_to_us"]).all()
        for _, g in list(df.groupby("user_id"))[:50]:
            g = g.sort_values(["valid_from_us", "event_id"])
            assert (g["valid_to_us"].iloc[-1]) == SENT
            assert (g["valid_to_us"].iloc[:-1].to_numpy()
                    == g["valid_from_us"].iloc[1:].to_numpy()).all()
        assert (df["valid_to_us"] == SENT).sum() == \
            df["user_id"].nunique()


class TestAutocorrDaily:
    def test_matches_numpy_corrcoef(self, ray_session):
        """r derived from the integer columns equals numpy's corrcoef
        of the dense series (up to float eval), and the columns are
        internally consistent."""
        from kgx.events import autocorr_daily, dense_daily_counts

        dense = dense_daily_counts(SF)
        out = autocorr_daily(SF)
        assert set(out["event_type"]) == set(dense["event_type"])
        for _, r in out.iterrows():
            g = dense[dense["event_type"] == r["event_type"]] \
                .sort_values("day")["n_events"].to_numpy("float64")
            x, y = g[:-1], g[1:]
            assert int(r["n_pairs"]) == len(x)
            if r["var_x_num"] > 0 and r["var_y_num"] > 0:
                want = np.corrcoef(x, y)[0, 1]
                got = r["cov_num"] / np.sqrt(
                    float(r["var_x_num"]) * float(r["var_y_num"]))
                assert abs(got - want) < 1e-9


class TestPsiDrift:
    def test_split_is_balanced_and_terms_nonneg_sum(self, ray_session):
        """Terms cover every language once; Σ(p_A−p_B)ln(p_A/p_B) ≥ 0
        always (each term has matching signs); counts partition the
        corpus."""
        import pyarrow.parquet as pq

        from kgx.textops import psi_drift

        out = psi_drift(SF)
        n_docs = len(pq.read_table(SF + "/documents.parquet",
                                   columns=["doc_id"]))
        assert int(out["n_a"].sum() + out["n_b"].sum()) == n_docs
        # smoothed PSI terms: each (p−q) and ln(p/q) share sign, so
        # every term (and the total) is ≥ 0 up to quantization
        assert (out["psi_term_q"] >= -1).all()
        assert out["lang"].is_unique


class TestItemSimilarity:
    def test_cosine_replay(self, ray_session):
        """Pairs and cos² equal a local basket replay."""
        from collections import Counter
        from itertools import combinations

        import pyarrow.parquet as pq

        from kgx.relational import item_similarity

        li = pq.read_table(SF + "/lineitem.parquet",
                           columns=["l_orderkey", "l_partkey"]) \
            .to_pandas().drop_duplicates()
        ci = Counter(li["l_partkey"])
        pairs = Counter()
        for _, g in li.groupby("l_orderkey"):
            for a, b in combinations(sorted(set(g["l_partkey"])), 2):
                pairs[(int(a), int(b))] += 1
        want = {k: v for k, v in pairs.items() if v >= 2}
        out = item_similarity(SF)
        got = {(int(r["part_a"]), int(r["part_b"])): int(r["n_ab"])
               for _, r in out.iterrows()}
        assert got == want
        for _, r in out.iterrows():
            a, b = int(r["part_a"]), int(r["part_b"])
            assert int(r["n_a"]) == ci[a] and int(r["n_b"]) == ci[b]
            assert int(r["cos2_q"]) == (
                10**12 * int(r["n_ab"]) ** 2) // (ci[a] * ci[b])
            assert 0 < int(r["cos2_q"]) <= 10**12


class TestPartitionPrunedRead:
    def test_other_partitions_never_opened(self, ray_session):
        """Corrupting every OTHER language's partition files leaves
        the pruned read working — proof the layout, not a row filter,
        does the skipping — and the digest matches the en subset."""
        import glob
        import hashlib
        import os

        import pyarrow.parquet as pq

        from kgx.sources import _roundtrip_dir, partition_pruned_read

        first = partition_pruned_read(SF).to_pandas()
        out = _roundtrip_dir(SF, "hive")
        others = [f for f in glob.glob(out + "/lang=*/*")
                  if "/lang=en/" not in f]
        assert others  # the layout really has other partitions
        saved = {f: open(f, "rb").read() for f in others}
        try:
            for f in others:
                with open(f, "wb") as fp:
                    fp.write(b"corrupt")
            again = partition_pruned_read(SF).to_pandas()
        finally:
            for f, blob in saved.items():
                with open(f, "wb") as fp:
                    fp.write(blob)
        assert sorted(again["doc_id"]) == sorted(first["doc_id"])

        docs = pq.read_table(SF + "/documents.parquet").to_pandas()
        en = docs[docs["lang"] == "en"]
        assert sorted(first["doc_id"]) == sorted(en["doc_id"])
        md5 = {int(r["doc_id"]): hashlib.md5(
            r["text"].encode()).hexdigest() for _, r in en.iterrows()}
        got = dict(zip(first["doc_id"].astype(int),
                       first["text_md5"]))
        assert got == md5


class TestHitsScores:
    def test_fast_equals_distributed_and_local_replay(self,
                                                      ray_session):
        """The ≤2M-edge gate and the distributed vector loop return
        row-identical scores, both equal to a dict-based replay."""
        import pyarrow.parquet as pq

        from kgx.components import hits_scores

        fast = hits_scores(SF)
        dist = hits_scores(SF, small_graph_threshold=0)
        assert fast.equals(dist)

        ids = sorted(pq.read_table(SF + "/documents.parquet",
                                   columns=["doc_id"])
                     .column("doc_id").to_pylist())
        n = len(ids)
        edges = set()
        for i in ids:
            if i > 0:
                edges.add((i, i // 2))
            edges.add((i, (i * i + 1) % n))
        h = {i: 1 for i in ids}
        a = {}
        for _ in range(3):
            a = {}
            for s, d in edges:
                a[d] = a.get(d, 0) + h.get(s, 0)
            h = {}
            for s, d in edges:
                h[s] = h.get(s, 0) + a.get(d, 0)
        got = {int(r["doc_id"]): (int(r["hub_q"]), int(r["auth_q"]))
               for _, r in fast.iterrows()}
        assert got == {i: (h.get(i, 0), a.get(i, 0)) for i in ids}
        # authorities concentrate somewhere: scores are not constant
        assert fast["auth_q"].nunique() > 1


class TestIntervalCoverage:
    def test_matches_brute_force_union(self, ray_session):
        """Per-user coverage equals a brute-force interval-union
        replay; engulfed intervals add nothing."""
        import pandas as pd
        import pyarrow.parquet as pq

        from kgx.events import interval_coverage

        ev = pq.read_table(SF + "/events.parquet",
                           columns=["user_id", "ts", "value"]) \
            .to_pandas()
        s = ((ev["ts"] - pd.Timestamp(0))
             // pd.Timedelta(microseconds=1)).astype("int64")
        cents = np.floor(100.0 * ev["value"] + 0.5).astype("int64")
        ev = pd.DataFrame({"u": ev["user_id"].astype(int), "s": s,
                           "e": s + cents * 10_000})
        want = {}
        for u, g in ev.groupby("u"):
            isl, cov, cur_s, cur_e = 0, 0, None, None
            for _, r in g.sort_values(["s", "e"]).iterrows():
                if cur_e is None or r["s"] > cur_e:
                    if cur_e is not None:
                        cov += cur_e - cur_s
                    isl += 1
                    cur_s, cur_e = int(r["s"]), int(r["e"])
                else:
                    cur_e = max(cur_e, int(r["e"]))
            cov += cur_e - cur_s
            want[int(u)] = (isl, cov)
        out = interval_coverage(SF).to_pandas()
        got = {int(r["user_id"]): (int(r["n_islands"]),
                                   int(r["covered_us"]))
               for _, r in out.iterrows()}
        assert got == want


class TestTableCdcDiff:
    def test_rule_counts_and_self_diff_empty(self, ray_session):
        """Ops match the md5 rules exactly (removed ⟺ rule 0, changed
        ⟺ rule 1, added ⟺ one spawned row per rule 2); the three
        classes are disjoint."""
        import pyarrow.parquet as pq

        from kgx.sources import table_cdc_diff
        from kgx.traindata import _md5_u64

        ids = pq.read_table(SF + "/documents.parquet",
                            columns=["doc_id"]) \
            .column("doc_id").to_pylist()
        rule = {d: _md5_u64("%d:cdc" % d) % 10 for d in ids}
        out = table_cdc_diff(SF)
        got = {op: set(g["doc_id"].astype(int))
               for op, g in out.groupby("op")}
        assert got.get("removed", set()) == \
            {d for d, r in rule.items() if r == 0}
        assert got.get("changed", set()) == \
            {d for d, r in rule.items() if r == 1}
        assert got.get("added", set()) == \
            {d + 1_000_000_000 for d, r in rule.items() if r == 2}
        assert not (got["removed"] & got["changed"])


class TestValuePercentilesCont:
    def test_matches_numpy_linear_interpolation(self, ray_session):
        """p50_x2/2 and p95_x20/20 equal numpy's linear-interpolation
        percentiles of the cents values per type."""
        import pyarrow.parquet as pq

        from kgx.events import value_percentiles_cont

        ev = pq.read_table(SF + "/events.parquet",
                           columns=["event_type", "value"]) \
            .to_pandas()
        ev["c"] = np.floor(100.0 * ev["value"] + 0.5).astype("int64")
        out = value_percentiles_cont(SF)
        for _, r in out.iterrows():
            c = ev.loc[ev["event_type"] == r["event_type"], "c"] \
                .to_numpy("float64")
            assert int(r["n"]) == len(c)
            assert abs(int(r["p50_x2"]) / 2
                       - np.percentile(c, 50)) < 1e-9
            assert abs(int(r["p95_x20"]) / 20
                       - np.percentile(c, 95)) < 1e-7


class TestPerceptronLangid:
    def test_learns_hidden_rule_above_majority(self, ray_session):
        """The pocket weights recover the hidden stopword-density rule
        well above the majority baseline, and predictions equal a
        local integer replay."""
        from kgx.traindata import _PERC_STOPS, perceptron_langid

        import pyarrow.parquet as pq

        d = pq.read_table(SF + "/documents.parquet",
                          columns=["doc_id", "text"]).to_pandas()
        stops = set(_PERC_STOPS)
        f2 = d["text"].str.split(" ").str.len().clip(upper=63) \
            .to_numpy("int64")
        f3 = np.array([min(sum(1 for t in ts if t in stops), 15)
                       for ts in d["text"].str.lower().str.split(" ")],
                      dtype="int64")
        y = np.where(16 * f3 > f2, 1, -1)
        f1 = np.ones(len(d), dtype="int64")
        F = np.stack([f1, f2, f3])
        w = np.zeros(3, dtype=object)
        pocket, pocket_mis = w.copy(), None
        for _ in range(40):
            m = y * (w @ F) <= 0
            nm = int(m.sum())
            if pocket_mis is None or nm < pocket_mis:
                pocket, pocket_mis = w.copy(), nm
            if nm == 0:
                break
            w = w + (y[m] * F[:, m]).sum(axis=1)
        out = perceptron_langid(SF)
        out = (out.to_pandas() if hasattr(out, "to_pandas") else out) \
            .sort_values("doc_id").reset_index(drop=True)
        yhat = np.where(pocket @ F > 0, 1, -1)
        order = np.argsort(d["doc_id"].to_numpy())
        assert (out["y"].to_numpy() == y[order]).all()
        assert (out["yhat"].to_numpy() == yhat[order]).all()
        acc = (out["y"] == out["yhat"]).mean()
        maj = max((y == 1).mean(), (y == -1).mean())
        assert acc > maj + 0.1  # genuinely learned, not majority-voted

    def test_converges_on_fat_margin_corpus(self, ray_session,
                                            tmp_path):
        """On a linearly separable fat-margin corpus the pocket
        perceptron reaches 100% within the epoch budget."""
        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        from kgx.traindata import perceptron_langid

        rows = []
        for i in range(60):
            if i % 2:  # dense stopwords, short doc → y = +1
                rows.append((i, "the and of to a in is the and of"))
            else:      # no stopwords, long doc → y = −1
                rows.append((i, " ".join(["word"] * 40)))
        df = pd.DataFrame(rows, columns=["doc_id", "text"])
        df["lang"] = "en"
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                       str(tmp_path / "documents.parquet"))
        out = perceptron_langid(str(tmp_path))
        out = out.to_pandas() if hasattr(out, "to_pandas") else out
        assert (out["y"] == out["yhat"]).all()
        assert set(out["y"]) == {1, -1}


class TestDailyAnomalies:
    def test_planted_spike_is_flagged(self, ray_session, tmp_path):
        """A constructed series (steady 2/day, one 50-event spike)
        flags exactly the spike day; MAD is spike-proof."""
        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        from kgx.events import daily_anomalies

        day = 86_400_000_000
        rows = []
        eid = 0
        for d in range(20):
            n = 50 if d == 7 else 2
            for _ in range(n):
                rows.append((eid, d * day + eid, 1, "view", 1.0,
                             "{}"))
                eid += 1
        df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                         "event_type", "value",
                                         "props"])
        df["ts"] = pd.to_datetime(df["ts"], unit="us")
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                       str(tmp_path / "events.parquet"))
        out = daily_anomalies(str(tmp_path))
        flagged = set(out.loc[out["is_anomaly"] == 1, "day"])
        assert flagged == {7}

    def test_consistent_with_dense_grid(self, ray_session):
        from kgx.events import daily_anomalies, dense_daily_counts

        a = daily_anomalies(SF)
        d = dense_daily_counts(SF)
        assert len(a) == len(d)
        m = a.merge(d, on=["event_type", "day"])
        assert (m["n_events_x"] == m["n_events_y"]).all()


class TestKgCycleNodes:
    def test_matches_networkx_style_cycle_detection(self, ray_session):
        """Cyclic nodes equal a local SCC replay (size ≥ 2 or
        self-loop), and the tree rule alone contributes none."""
        import pyarrow.parquet as pq

        from kgx.components import kg_cycle_nodes

        ids = pq.read_table(SF + "/documents.parquet",
                            columns=["doc_id"]) \
            .column("doc_id").to_pylist()
        n = len(ids)
        edges = set()
        for i in ids:
            if i > 0:
                edges.add((i, i // 2))
            edges.add((i, (i * i + 1) % n))
        # iterative Tarjan-free check: node cyclic iff it reaches
        # itself (BFS from each node over successor lists)
        succ = {}
        for s, d in edges:
            succ.setdefault(s, set()).add(d)
        cyclic = set()
        for start in ids:
            seen, frontier = set(), {start}
            while frontier:
                nxt = set()
                for x in frontier:
                    for y in succ.get(x, ()):
                        if y == start:
                            cyclic.add(start)
                            frontier = set()
                            nxt = set()
                            break
                        if y not in seen:
                            seen.add(y)
                            nxt.add(y)
                    else:
                        continue
                    break
                frontier = nxt
        out = kg_cycle_nodes(SF)
        assert sorted(out["doc_id"].astype(int)) == sorted(cyclic)
        assert len(cyclic) > 0  # the scatter rule makes real cycles


class TestRateLimitReplay:
    def test_sequential_replay_per_user(self, ray_session):
        """Admit decisions equal a per-user pure-Python walk; burst
        beyond capacity gets throttled on a constructed user."""
        import pandas as pd
        import pyarrow.parquet as pq

        from kgx.events import rate_limit_replay

        ev = pq.read_table(SF + "/events.parquet",
                           columns=["user_id", "event_id", "ts"]) \
            .to_pandas()
        ev["tus"] = ((ev["ts"] - pd.Timestamp(0))
                     // pd.Timedelta(microseconds=1)).astype("int64")
        CAP, COST = 5_000_000, 1_000_000
        want = {}
        for _, g in ev.groupby("user_id"):
            g = g.sort_values(["tus", "event_id"])
            b, prev = None, None
            for _, r in g.iterrows():
                if b is None:
                    b = CAP
                else:
                    b = min(CAP, b + (int(r["tus"]) - prev) // 10)
                ok = b >= COST
                if ok:
                    b -= COST
                want[int(r["event_id"])] = (int(ok), b)
                prev = int(r["tus"])
        out = rate_limit_replay(SF).to_pandas()
        got = {int(r["event_id"]): (int(r["admitted"]),
                                    int(r["bucket_q"]))
               for _, r in out.iterrows()}
        assert got == want

    def test_burst_throttled(self, ray_session, tmp_path):
        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        from kgx.events import rate_limit_replay

        # 8 events in the same millisecond: capacity 5 admits exactly 5
        df = pd.DataFrame({
            "event_id": range(8),
            "ts": pd.to_datetime([1000 + i for i in range(8)],
                                 unit="us"),
            "user_id": [7] * 8, "event_type": ["view"] * 8,
            "value": [1.0] * 8, "props": ["{}"] * 8})
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                       str(tmp_path / "events.parquet"))
        out = rate_limit_replay(str(tmp_path)).to_pandas()
        assert int(out["admitted"].sum()) == 5
        assert (out.sort_values("event_id")["admitted"].to_numpy()[:5]
                == 1).all()


class TestQuantileSketchValues:
    def test_sketch_close_to_exact_quantiles(self, ray_session):
        """Sketch cutpoints land within a few percentile ranks of the
        exact quantiles (k=512 ⇒ ±~5 rank-% whp), and the sample is
        the deterministic bottom-k by hash."""
        import math

        import pyarrow.parquet as pq

        from kgx.traindata import quantile_sketch_values

        ev = pq.read_table(SF + "/events.parquet",
                           columns=["value"]).to_pandas()
        cents = np.sort(np.floor(100.0 * ev["value"] + 0.5)
                        .astype("int64").to_numpy())
        out = quantile_sketch_values(SF)
        n = len(cents)
        for _, r in out.iterrows():
            v = int(r["value_cents"])
            # rank of the sketch answer in the exact distribution
            rank = np.searchsorted(cents, v, side="right") / n
            assert abs(rank - r["q_pct"] / 100.0) < 0.08
        assert int(out["k_used"].iloc[0]) == min(512, n)

    def test_mergeable(self, ray_session):
        """Bottom-k of the union == union of per-half bottom-k — the
        sketch merge property."""
        import pandas as pd
        import pyarrow.parquet as pq

        from kgx.traindata import _md5_u64

        ev = pq.read_table(SF + "/events.parquet",
                           columns=["event_id", "value"]).to_pandas()
        ev["h"] = [_md5_u64("%d:qsk" % e) for e in ev["event_id"]]
        ev["cents"] = np.floor(100.0 * ev["value"] + 0.5) \
            .astype("int64")
        full = ev.sort_values(["h", "cents"]).head(512)
        a = ev.iloc[::2].sort_values(["h", "cents"]).head(512)
        b = ev.iloc[1::2].sort_values(["h", "cents"]).head(512)
        merged = pd.concat([a, b]).sort_values(["h", "cents"]) \
            .head(512)
        assert list(merged["h"]) == list(full["h"])


class TestDpNoisyCounts:
    def test_noise_deterministic_and_laplace_shaped(self, ray_session):
        """Noise replays from the md5 tree exactly; true counts
        partition the corpus; |noise| is in the Laplace(1) range."""
        import math

        import pyarrow.parquet as pq

        from kgx.traindata import _md5_u64, dp_noisy_counts

        out = dp_noisy_counts(SF)
        docs = pq.read_table(SF + "/documents.parquet",
                             columns=["lang"]).to_pandas()
        assert int(out["n_true"].sum()) == len(docs)
        for _, r in out.iterrows():
            u1 = (float(_md5_u64("%s:dp1" % r["lang"])) + 1) / 2**64
            u2 = (float(_md5_u64("%s:dp2" % r["lang"])) + 1) / 2**64
            assert int(r["noise_q6"]) == math.floor(
                1e6 * (1.0 * math.log(u1 / u2)))
            assert int(r["n_noisy_q6"]) == \
                10**6 * int(r["n_true"]) + int(r["noise_q6"])
        # Laplace(1): P(|x| > 15) ≈ 3e-7 — bounded in any sane draw
        assert (out["noise_q6"].abs() < 15_000_000).all()


class TestGraphRandomWalks:
    def test_fast_equals_distributed_and_walk_validity(self,
                                                       ray_session):
        """Gate and distributed loop agree row-for-row; every path has
        steps+1 hops and every hop follows a real k-NN edge."""
        from kgx.components import graph_random_walks
        from kgx.simsearch import knn_graph

        fast = graph_random_walks(SF)
        dist = graph_random_walks(SF, small_graph_threshold=0)
        assert fast.equals(dist)

        edges = knn_graph(SF, k=5).to_pandas()
        adj = {}
        for _, r in edges.iterrows():
            adj.setdefault(int(r["vec_id"]), set()).add(
                int(r["neighbor_id"]))
        for _, r in fast.head(100).iterrows():
            hops = [int(x) for x in r["path"].split(">")]
            assert len(hops) == 7  # start + 6 steps
            assert hops[0] == int(r["vec_id"])
            for a, b in zip(hops, hops[1:]):
                assert b in adj[a]


class TestNegativeSamples:
    def test_draws_follow_pow34_distribution(self, ray_session):
        """Sampling replays locally; frequent tokens draw more often
        and the power damps the head vs raw-frequency sampling."""
        import math
        from collections import Counter

        import pyarrow.parquet as pq

        from kgx.traindata import _md5_u64, negative_samples

        docs = pq.read_table(SF + "/documents.parquet",
                             columns=["text"]).to_pandas()
        f = Counter()
        for t in docs["text"]:
            f.update(t.split(" "))
        toks = sorted(f)
        w = [math.floor(math.sqrt(math.floor(math.sqrt(
            (float(f[t]) * f[t]) * f[t])))) for t in toks]
        cum = np.cumsum([0] + w)
        total = int(cum[-1])
        want = []
        for i in range(500):
            d = _md5_u64("%d:neg" % i) % total
            want.append(toks[int(np.searchsorted(cum, d,
                                                 side="right")) - 1])
        out = negative_samples(SF)
        assert list(out["token"]) == want
        # empirical draw frequencies track the f^0.75 weights
        counts = Counter(out["token"])
        tv = sum(abs(counts.get(t, 0) - 500 * wt / total)
                 for t, wt in zip(toks, w)) / 500
        assert tv < 0.25  # total-variation gap to the target law


class TestAucEval:
    def test_matches_sklearn_style_rank_auc(self, ray_session):
        """auc_ppm equals a direct tie-averaged rank computation, and
        the score genuinely ranks above chance for the rule."""
        import pyarrow.parquet as pq

        from kgx.textops import auc_eval

        docs = pq.read_table(SF + "/documents.parquet",
                             columns=["text"]).to_pandas()
        stops = {"the", "and", "of", "to", "a", "in", "is"}
        f2 = docs["text"].str.split(" ").str.len().clip(upper=63) \
            .to_numpy("int64")
        f3 = np.array([min(sum(1 for t in ts if t in stops), 15)
                       for ts in docs["text"].str.lower()
                       .str.split(" ")], dtype="int64")
        y = (16 * f3 > f2).astype(int)
        # tie-averaged ranks via pandas
        ranks = pd.Series(f3).rank(method="average")
        n_pos, n_neg = int(y.sum()), int((1 - y).sum())
        u = float(ranks[y == 1].sum()) - n_pos * (n_pos + 1) / 2
        want_auc = u / (n_pos * n_neg)
        out = auc_eval(SF)
        assert int(out["n_pos"].iloc[0]) == n_pos
        assert int(out["u_x2"].iloc[0]) == int(round(2 * u))
        assert abs(int(out["auc_ppm"].iloc[0]) / 1e6 - want_auc) < 1e-6
        assert int(out["auc_ppm"].iloc[0]) > 600_000  # above chance


class TestPerceptronGate:
    def test_gate_equals_distributed(self, ray_session):
        from kgx.traindata import perceptron_langid

        fast = perceptron_langid(SF)
        fast = fast.to_pandas() if hasattr(fast, "to_pandas") else fast
        dist = perceptron_langid(SF, iters=6,
                                 small_corpus_threshold=0)
        dist = dist.to_pandas() if hasattr(dist, "to_pandas") else dist
        f6 = perceptron_langid(SF, iters=6)
        f6 = f6.to_pandas() if hasattr(f6, "to_pandas") else f6
        key = lambda d: d.sort_values("doc_id").reset_index(drop=True)
        assert key(f6).equals(key(dist))
        assert len(fast) == len(dist)


class TestPrCurve:
    def test_monotone_and_consistent_with_auc(self, ray_session):
        """Recall is non-increasing in the threshold, t=0 predicts
        everything (recall 1.0), counts tie out per row."""
        from kgx.textops import pr_curve

        out = pr_curve(SF).sort_values("threshold")
        assert (out["recall_ppm"].diff().dropna() <= 0).all()
        first = out.iloc[0]
        assert int(first["recall_ppm"]) == 10**6
        assert int(first["fn"]) == 0
        n_pos = int(first["tp"])
        for _, r in out.iterrows():
            assert int(r["tp"]) + int(r["fn"]) == n_pos
            denom = int(r["tp"]) + int(r["fp"])
            if denom:
                assert int(r["precision_ppm"]) == \
                    (10**6 * int(r["tp"])) // denom


class TestStratifiedSplit:
    def test_exact_proportions_and_determinism(self, ray_session):
        """Per-lang counts are exactly floor(0.8n)/floor(0.1n)/rest;
        two runs agree; every doc appears once."""
        import pyarrow.parquet as pq

        from kgx.traindata import stratified_split

        docs = pq.read_table(SF + "/documents.parquet",
                             columns=["doc_id", "lang"]).to_pandas()
        out = stratified_split(SF).to_pandas()
        assert len(out) == len(docs)
        assert out["doc_id"].is_unique
        for lang, g in out.groupby("lang"):
            n = len(docs[docs["lang"] == lang])
            c = g["split"].value_counts()
            assert int(c.get("train", 0)) == n * 80 // 100
            assert int(c.get("val", 0)) == n * 10 // 100
            assert int(c.get("test", 0)) == \
                n - n * 80 // 100 - n * 10 // 100
        again = stratified_split(SF).to_pandas()
        m = out.merge(again, on="doc_id", suffixes=("_a", "_b"))
        assert (m["split_a"] == m["split_b"]).all()


class TestStumpSplit:
    def test_best_split_is_pure_and_rows_consistent(self, ray_session):
        """The sweep's row counts partition N per row; the argmin row
        splits on the stopword feature and beats the unsplit node's
        impurity (the split genuinely learns the density rule)."""
        from kgx.textops import stump_split

        out = stump_split(SF)
        n = int(out.iloc[0]["n_left"] + out.iloc[0]["n_right"])
        assert (out["n_left"] + out["n_right"] == n).all()
        assert (out["pos_left"] <= out["n_left"]).all()
        assert (out["pos_right"] <= out["n_right"]).all()
        # t=0 leaves everything on the right: weighted == root gini
        root = out[(out.threshold == 0) & (out.feature == 0)].iloc[0]
        root_gini = int(root["gini_right_ppm"])
        best = out.loc[out["weighted_ppm"].idxmin()]
        assert int(best["feature"]) == 1  # stopword count
        assert int(best["weighted_ppm"]) < root_gini // 2
        # exact gini replay on the best row
        for side in ("left", "right"):
            ns, ps = int(best[f"n_{side}"]), int(best[f"pos_{side}"])
            g = ns - ps
            want = (10**6 * (ns * ns - ps * ps - g * g)) // (ns * ns) \
                if ns else 0
            assert int(best[f"gini_{side}_ppm"]) == want


class TestSkipgramPairs:
    def test_window_replay_and_symmetry(self, ray_session):
        """Pair counts equal a direct per-doc window replay; the table
        is direction-symmetric (every (a,b) count equals (b,a)) and
        total mass is Σ_docs Σ_i |window ∩ doc|."""
        from collections import Counter

        import pyarrow.parquet as pq

        from kgx.textops import skipgram_pairs

        docs = pq.read_table(SF + "/documents.parquet",
                             columns=["text"]).to_pandas()["text"]
        want = Counter()
        for t in docs.str.split(" "):
            for i, c in enumerate(t):
                for j in range(max(0, i - 3), min(len(t), i + 4)):
                    if j != i:
                        want[(c, t[j])] += 1
        out = skipgram_pairs(SF).to_pandas()
        got = {(a, b): int(n) for a, b, n in
               out[["center", "context", "n"]].itertuples(index=False)}
        assert got == dict(want)
        for (a, b), n in got.items():
            assert got[(b, a)] == n


class TestSpatialNeighborPairs:
    def test_brute_force_replay_and_exactly_once(self, ray_session):
        """Grid-bucketed pairs equal the brute-force O(n²) replay;
        the min-home-cell rule emits each pair exactly once (no dups
        even though every point is replicated to 9 cells)."""
        import pyarrow.parquet as pq

        from kgx.dedup import spatial_neighbor_pairs
        from kgx.traindata import _md5_u64

        ids = pq.read_table(SF + "/documents.parquet",
                            columns=["doc_id"]).to_pandas()["doc_id"]
        G, r = 1 << 20, 16384
        pts = {int(d): (_md5_u64("x:%d" % d) % G, _md5_u64("y:%d" % d) % G)
               for d in ids}
        keys = sorted(pts)
        want = {}
        for i, a in enumerate(keys):
            for b in keys[i + 1:]:
                d2 = ((pts[a][0] - pts[b][0]) ** 2
                      + (pts[a][1] - pts[b][1]) ** 2)
                if d2 <= r * r:
                    want[(a, b)] = d2
        out = spatial_neighbor_pairs(SF).to_pandas()
        assert len(out) == len(out.drop_duplicates(["doc_a", "doc_b"]))
        got = {(int(a), int(b)): int(d) for a, b, d in
               out[["doc_a", "doc_b", "dist2"]].itertuples(index=False)}
        assert got == want

    def test_radius_monotone(self, ray_session):
        """A smaller radius yields a subset of the pairs (cell size
        tracks the radius, so this exercises a different grid too)."""
        from kgx.dedup import spatial_neighbor_pairs

        big = spatial_neighbor_pairs(SF).to_pandas()
        small = spatial_neighbor_pairs(SF, radius=8192).to_pandas()
        bigset = set(map(tuple, big[["doc_a", "doc_b"]].values.tolist()))
        smallset = set(map(tuple,
                           small[["doc_a", "doc_b"]].values.tolist()))
        assert smallset <= bigset
        assert (small["dist2"] <= 8192 * 8192).all()


class TestPcaPower:
    def test_scores_align_with_true_top_component(self, ray_session):
        """Three integer power-iteration rounds recover the dominant
        eigenvector: engine scores correlate ≥0.99 in absolute value
        with the exact float projection onto numpy's top PC of the
        same quantized matrix."""
        import pyarrow.parquet as pq

        from kgx.simsearch import pca_power

        emb = pq.read_table(SF + "/embeddings.parquet",
                            columns=["vec_id", "embedding"]).to_pandas()
        X = np.floor(1024.0 * np.array(emb["embedding"].tolist(),
                                       dtype=np.float64))
        Xc = X - X.mean(axis=0)
        _, vecs = np.linalg.eigh(Xc.T @ Xc)
        top = vecs[:, -1]
        proj = X @ top
        out = (pca_power(SF).to_pandas()
               .set_index("vec_id").loc[emb["vec_id"]]["score"]
               .to_numpy("float64"))
        r = np.corrcoef(proj, out)[0, 1]
        assert abs(r) > 0.99
        assert len(np.unique(out)) > 100  # genuinely spreads the data


class TestIvfpqGate:
    def test_gate_equals_distributed(self, ray_session):
        """The single-task small-table gate is row-identical to the
        distributed exchange path (same encode/score/rescore float
        trees)."""
        from kgx.simsearch import knn_ivfpq

        fast = knn_ivfpq(SF)
        fast = fast.to_pandas() if hasattr(fast, "to_pandas") else fast
        dist = knn_ivfpq(SF, small_table_threshold=0)
        dist = dist.to_pandas() if hasattr(dist, "to_pandas") else dist
        key = lambda d: d.sort_values(["query_id", "rank"]) \
            .reset_index(drop=True)
        assert key(fast).equals(key(dist))

    def test_ivf_gate_equals_distributed(self, ray_session):
        from kgx.simsearch import knn_ivf

        fast = knn_ivf(SF)
        fast = fast.to_pandas() if hasattr(fast, "to_pandas") else fast
        dist = knn_ivf(SF, small_table_threshold=0)
        dist = dist.to_pandas() if hasattr(dist, "to_pandas") else dist
        key = lambda d: d.sort_values(["query_id", "rank"]) \
            .reset_index(drop=True)
        assert key(fast).equals(key(dist))


class TestBpeTrainGate:
    def test_gate_equals_distributed(self, ray_session):
        from kgx.traindata import bpe_train

        fast = bpe_train(SF).reset_index(drop=True)
        dist = bpe_train(SF, small_vocab_threshold=0)
        dist = (dist.to_pandas() if hasattr(dist, "to_pandas")
                else dist).reset_index(drop=True)
        assert fast.equals(dist)


class TestClusteringCoeffGate:
    def test_gate_equals_distributed(self, ray_session):
        from kgx.components import clustering_coeff

        fast = clustering_coeff(SF)
        fast = fast.to_pandas() if hasattr(fast, "to_pandas") else fast
        dist = clustering_coeff(SF, small_edges_threshold=0)
        dist = dist.to_pandas() if hasattr(dist, "to_pandas") else dist
        key = lambda d: d.sort_values("node").reset_index(drop=True)
        assert key(fast).equals(key(dist))


class TestKcenterCoreset:
    def test_greedy_property_and_gate(self, ray_session):
        """Every non-center point is nearer to its assigned center than
        any point is to a center chosen LATER would have been at that
        round (the greedy max-min invariant: selection distances are
        non-increasing); gate == distributed pinned."""
        from kgx.simsearch import kcenter_coreset

        out = kcenter_coreset(SF)
        out = out.to_pandas() if hasattr(out, "to_pandas") else out
        centers = out[out["dist2"] == 0]
        assert len(set(centers["center"])) == 8
        # center rows assign to themselves
        self_rows = out[out["vec_id"].isin(set(centers["center"]))]
        assert (self_rows["vec_id"] == self_rows["center"]).all()
        dist = kcenter_coreset(SF, small_table_threshold=0)
        dist = dist.to_pandas() if hasattr(dist, "to_pandas") else dist
        key = lambda d: d.sort_values("vec_id").reset_index(drop=True)
        assert key(out).equals(key(dist))

    def test_coverage_radius_shrinks_with_k(self, ray_session):
        """max assignment distance (the k-center objective) is
        non-increasing in k."""
        from kgx.simsearch import kcenter_coreset

        def radius(k):
            o = kcenter_coreset(SF, k=k)
            o = o.to_pandas() if hasattr(o, "to_pandas") else o
            return int(o["dist2"].max())

        assert radius(8) <= radius(4) <= radius(2)


class TestMutualKnn:
    def test_subset_symmetric_and_rank_preserved(self, ray_session):
        """Mutual edges are a subset of knn_graph, the surviving edge
        SET is symmetric, and each kept row retains its original
        rank."""
        from kgx.simsearch import knn_graph, mutual_knn

        g = knn_graph(SF).to_pandas()
        m = mutual_knn(SF)
        m = m.to_pandas() if hasattr(m, "to_pandas") else m
        gset = {(a, b): r for a, b, r in
                g[["vec_id", "neighbor_id", "rank"]]
                .itertuples(index=False)}
        mset = {(a, b): r for a, b, r in
                m[["vec_id", "neighbor_id", "rank"]]
                .itertuples(index=False)}
        assert set(mset) <= set(gset)
        for (a, b), r in mset.items():
            assert (b, a) in mset
            assert gset[(a, b)] == r
        assert 0 < len(mset) < len(gset)


class TestSsspWeighted:
    def test_dijkstra_replay_and_bfs_bound(self, ray_session):
        """8 synchronized Bellman-Ford rounds equal true shortest-path
        distances here (converged: round count ≥ weighted-hop
        eccentricity, checked via a heapq Dijkstra replay); weighted
        dist ≥ hop dist from bfs_distances on every node."""
        import heapq

        from kgx.components import bfs_distances, sssp_weighted
        from kgx.simsearch import knn_graph

        g = knn_graph(SF).to_pandas()
        adj: dict = {}
        for a, b, r in g[["vec_id", "neighbor_id", "rank"]] \
                .itertuples(index=False):
            adj.setdefault(int(a), []).append((int(b), int(r)))
            adj.setdefault(int(b), []).append((int(a), int(r)))
        seeds = sorted({int(v) for v in g["vec_id"]} |
                       {int(v) for v in g["neighbor_id"]})
        seeds = [v for v in seeds if v % 97 == 0]
        dist = {s: 0 for s in seeds}
        h = [(0, s) for s in seeds]
        heapq.heapify(h)
        while h:
            d, u = heapq.heappop(h)
            if d > dist.get(u, 1 << 62):
                continue
            for v, w in adj.get(u, ()):
                nd = d + w
                if nd < dist.get(v, 1 << 62):
                    dist[v] = nd
                    heapq.heappush(h, (nd, v))
        out = sssp_weighted(SF)
        out = out.to_pandas() if hasattr(out, "to_pandas") else out
        got = {int(a): int(b) for a, b in
               out[["vec_id", "dist"]].itertuples(index=False)}
        assert got == dist  # converged ⇒ fixed rounds == true SSSP
        hops = bfs_distances(SF).to_pandas()
        hd = {int(a): int(b) for a, b in
              hops[["vec_id", "dist"]].itertuples(index=False)}
        for n, d in got.items():
            assert d >= hd[n]  # every edge weighs ≥ 1


class TestSessionOverlapPairs:
    def test_brute_force_replay_exactly_once(self, ray_session):
        """Grid-bucketed overlap pairs equal a brute-force session
        cross-check; no pair appears twice despite multi-cell
        replication; a tiny grid cell (1h) gives the same answer as
        the default (different replication fan-out, same rule)."""
        from kgx.events import session_overlap_pairs, session_table

        s = session_table(SF).to_pandas()
        rows = list(s[["user_id", "session_idx", "start_us", "end_us"]]
                    .itertuples(index=False))
        want = {}
        for i, a in enumerate(rows):
            for b in rows[i + 1:]:
                x, y = (a, b) if a[0] < b[0] else (b, a)
                if x[0] == y[0]:
                    continue
                mx, mn = max(x[2], y[2]), min(x[3], y[3])
                if mx <= mn:
                    want[(x[0], x[1], y[0], y[1])] = mn - mx
        out = session_overlap_pairs(SF)
        out = out.to_pandas() if hasattr(out, "to_pandas") else out
        assert len(out) == len(out.drop_duplicates(
            ["user_a", "session_a", "user_b", "session_b"]))
        got = {(a, sa, b, sb): o for a, sa, b, sb, o in
               out[["user_a", "session_a", "user_b", "session_b",
                    "ovl_us"]].itertuples(index=False)}
        assert got == want
        small = session_overlap_pairs(SF, cell_hours=1)
        small = (small.to_pandas() if hasattr(small, "to_pandas")
                 else small)
        got2 = {(a, sa, b, sb): o for a, sa, b, sb, o in
                small[["user_a", "session_a", "user_b", "session_b",
                       "ovl_us"]].itertuples(index=False)}
        assert got2 == want


class TestGzipNdjsonRoundtrip:
    def test_lossless_and_genuinely_compressed(self, ray_session):
        """Digest equals a direct parquet-side digest; the on-disk
        shards are real gzip members (magic bytes, >1 compression
        ratio) with deterministic bytes (mtime pinned)."""
        import glob
        import gzip
        import hashlib

        import pyarrow.parquet as pq

        from kgx.sources import _roundtrip_dir, gzip_ndjson_roundtrip

        out = gzip_ndjson_roundtrip(SF).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        docs = pq.read_table(SF + "/documents.parquet",
                             columns=["doc_id", "text"]).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        assert len(out) == len(docs)
        want = [hashlib.md5(t.encode()).hexdigest()
                for t in docs["text"]]
        assert list(out["text_md5"]) == want
        shard = glob.glob(_roundtrip_dir(SF, "gzndjson")
                          + "/*.jsonl.gz")[0]
        raw = open(shard, "rb").read()
        assert raw[:2] == b"\x1f\x8b"
        assert len(gzip.decompress(raw)) > 2 * len(raw)


class TestBootstrapMeans:
    def test_weights_follow_poisson_and_ci_brackets_truth(
            self, ray_session):
        """Per-replica effective n is ≈ corpus n (Poisson(1) weights
        sum to n in expectation), the replica spread brackets the true
        mean, and a local replay of replica 0 agrees exactly."""
        import pyarrow.parquet as pq

        from kgx.traindata import _POISSON1_TH, _md5_u64, bootstrap_means

        docs = pq.read_table(SF + "/documents.parquet",
                             columns=["doc_id", "n_chars"]).to_pandas()
        out = bootstrap_means(SF)
        n = len(docs)
        assert ((out["n_eff"] - n).abs() < 4 * np.sqrt(n)).all()
        true_mean = docs["n_chars"].mean()
        assert out["mean_q6"].min() <= true_mean * 1e6 \
            <= out["mean_q6"].max()
        th = np.array(_POISSON1_TH, dtype=np.uint64)
        u = np.array([_md5_u64("bs:0:%d" % d) for d in docs["doc_id"]],
                     dtype=np.uint64)
        w = np.searchsorted(th, u, side="right").astype("int64")
        r0 = out[out["replica"] == 0].iloc[0]
        assert int(r0["n_eff"]) == int(w.sum())
        assert int(r0["sum_chars"]) == int(
            (w * docs["n_chars"].to_numpy("int64")).sum())


class TestLinkageScores:
    def test_weights_order_and_replay(self, ray_session):
        """Full-agreement pairs outscore partial ones; the score of a
        sampled row replays exactly from the closed-form weights."""
        import math

        import pyarrow.parquet as pq

        from kgx.dedup import linkage_scores

        out = linkage_scores(SF)
        out = out.to_pandas() if hasattr(out, "to_pandas") else out
        full = out[(out.agree_nation == 1) & (out.agree_segment == 1)]
        none = out[(out.agree_nation == 0) & (out.agree_segment == 0)]
        if len(full) and len(none):
            assert full["score_q6"].min() > none["score_q6"].max()
        cust = pq.read_table(SF + "/customer.parquet").to_pandas()
        n = len(cust)
        s_nat = int((cust.groupby("c_nationkey").size() ** 2).sum())
        s_seg = int((cust.groupby("c_mktsegment").size() ** 2).sum())
        s_name = int((cust.groupby("c_name").size() ** 2).sum())
        w_name = math.log((19.0 * n * n) / (20.0 * s_name))
        wa_n = math.log((19.0 * n * n) / (20.0 * s_nat))
        wd_n = math.log((1.0 * n * n) / (20.0 * (n * n - s_nat)))
        wa_s = math.log((19.0 * n * n) / (20.0 * s_seg))
        wd_s = math.log((1.0 * n * n) / (20.0 * (n * n - s_seg)))
        r = out.iloc[0]
        want = math.floor(1000000.0 * (
            (w_name + (wa_n if r["agree_nation"] else wd_n))
            + (wa_s if r["agree_segment"] else wd_s)))
        assert int(r["score_q6"]) == want
        # disagreement weights are negative, agreements positive
        assert wd_n < 0 < wa_n and wd_s < 0 < wa_s


class TestKmvJoinOverlap:
    def test_discriminates_joinable_columns(self, ray_session):
        """The joinable pair (custkey~custkey) estimates ~1.0 Jaccard,
        the cross-keyspace control is far lower and tracks the true
        resemblance within sketch error; per-side cardinalities are
        exact below k."""
        import duckdb

        from kgx.traindata import kmv_join_overlap

        out = kmv_join_overlap(SF).set_index("pair")
        good = out.loc["orders_custkey~customer_custkey"]
        ctrl = out.loc["orders_custkey~lineitem_suppkey"]
        assert int(good["jacc_est_ppm"]) > 900_000
        assert int(ctrl["jacc_est_ppm"]) < 300_000
        truth = duckdb.sql(f"""
          WITH a AS (SELECT DISTINCT o_custkey k
                     FROM '{SF}/orders.parquet'),
               b AS (SELECT DISTINCT l_suppkey k
                     FROM '{SF}/lineitem.parquet')
          SELECT (SELECT count(*) FROM a JOIN b USING (k)) * 1.0 /
                 (SELECT count(*) FROM (SELECT k FROM a UNION
                                        SELECT k FROM b))
        """).fetchone()[0]
        assert abs(int(ctrl["jacc_est_ppm"]) / 1e6 - truth) < 0.15
        # n < k ⇒ sketches are exhaustive ⇒ cardinalities exact
        ta = duckdb.sql(f"SELECT count(DISTINCT o_custkey) FROM "
                        f"'{SF}/orders.parquet'").fetchone()[0]
        if ta < 256:
            assert int(good["est_distinct_a"]) == ta


class TestBenfordDigits:
    def test_counts_partition_and_law_shape(self, ray_session):
        """Digit counts sum to the order count; expected_q6 terms sum
        to ~10⁶·N (the law is a distribution); the synthetic uniform
        prices measurably VIOLATE Benford (that's the audit signal —
        large |dev| on at least one digit)."""
        import duckdb

        from kgx.relational import benford_digits

        out = benford_digits(SF)
        n_orders = duckdb.sql(
            f"SELECT count(*) FROM '{SF}/orders.parquet'").fetchone()[0]
        assert int(out["n"].sum()) == n_orders
        s = int(out["expected_q6"].sum())
        assert abs(s - 10**6 * n_orders) <= 9  # floor loss per digit
        assert int(out["dev_ppm"].abs().max()) > 20_000


class TestLubyMis:
    def test_mis_valid_and_converged(self, ray_session):
        from kgx.components import luby_mis
        from kgx.dedup import jaccard_pairs

        got = luby_mis(SF)
        got = got.to_pandas() if hasattr(got, "to_pandas") else got
        st = dict(zip(got["doc_id"].astype(int),
                      got["status"].astype(int)))
        edges = jaccard_pairs(SF).to_pandas()
        # converged by round 8 on this corpus
        assert set(st.values()) <= {1, 2}
        # independence: no edge inside the MIS
        for a, b in zip(edges["doc_id_a"].astype(int),
                        edges["doc_id_b"].astype(int)):
            assert not (st[a] == 1 and st[b] == 1)
        # maximality: every excluded node has an MIS neighbour
        nbr_mis = {n: False for n in st}
        for a, b in zip(edges["doc_id_a"].astype(int),
                        edges["doc_id_b"].astype(int)):
            if st[b] == 1:
                nbr_mis[a] = True
            if st[a] == 1:
                nbr_mis[b] = True
        assert all(nbr_mis[n] for n, s in st.items() if s == 2)
        assert (got["status"] == 1).sum() > 0

    def test_mis_gate_matches_distributed(self, ray_session):
        from kgx.components import luby_mis

        gate = luby_mis(SF)
        gate = gate.to_pandas() if hasattr(gate, "to_pandas") else gate
        dist = luby_mis(SF, small_graph_threshold=0).to_pandas()
        g = gate.sort_values("doc_id").reset_index(drop=True)
        d = dist.sort_values("doc_id").reset_index(drop=True)
        assert g.astype("int64").equals(d.astype("int64"))


class TestXcorrDaily:
    def test_lag0_matches_numpy_corrcoef(self, ray_session):
        from kgx.events import dense_daily_counts, xcorr_daily

        got = xcorr_daily(SF)
        dense = dense_daily_counts(SF)
        piv = (dense[dense["event_type"].isin(["view", "purchase"])]
               .pivot_table(index="day", columns="event_type",
                            values="n_events", fill_value=0)
               .sort_index())
        for lag in (0, 3):
            x = piv["view"].to_numpy(float)
            y = piv["purchase"].to_numpy(float)
            xs = x[:len(x) - lag] if lag else x
            ys = y[lag:]
            want = np.corrcoef(xs, ys)[0, 1]
            r = got[got["lag"] == lag].iloc[0]
            have = r["cov_num"] / np.sqrt(
                float(r["var_x_num"]) * float(r["var_y_num"]))
            assert abs(want - have) < 1e-9
        assert (got["n_pairs"].to_numpy()
                == got["n_pairs"].iloc[0] - got["lag"].to_numpy()).all()


class TestSnmPairs:
    def test_snm_local_replay(self, ray_session):
        import pyarrow.parquet as pq

        from kgx.dedup import snm_pairs

        got = snm_pairs(SF).to_pandas()
        names = sorted(
            pq.read_table("%s/customer.parquet" % SF,
                          columns=["c_name"]).to_pandas()["c_name"]
            .astype(str), key=lambda s: s[::-1])
        want = set()
        for i, a in enumerate(names):
            for g in range(1, 6):
                if i + g < len(names):
                    want.add((a, names[i + g], g))
        assert set(map(tuple, got[["name_a", "name_b", "gap"]]
                       .values)) == want
        # exact count identity: 5N − 15
        assert len(got) == 5 * len(names) - 15
        assert len(got) == len(got.drop_duplicates())  # exactly-once

    def test_snm_halo_crosses_buckets(self, ray_session):
        # pairs whose reversed names start with different bytes can
        # only come from halo replication across range buckets
        from kgx.dedup import snm_pairs

        got = snm_pairs(SF).to_pandas()
        cross = got[got["name_a"].str[-1] != got["name_b"].str[-1]]
        assert len(cross) > 0


class TestCusum:
    def test_cusum_clamped_walk_replay(self, ray_session):
        from kgx.events import cusum_changepoint, dense_daily_counts

        got = cusum_changepoint(SF)
        dense = dense_daily_counts(SF)
        for et, g in dense.groupby("event_type"):
            g = g.sort_values("day")
            v = [int(x) for x in g["n_events"]]
            ref = sum(v) // len(v)
            s, want = 0, []
            for x in v:
                s = max(0, s + x - ref)
                want.append(s)
            have = got[got["event_type"] == et].sort_values("day")
            assert have["cusum"].tolist() == want
            assert (have["alarm"]
                    == (have["cusum"] > ref // 2).astype(int)).all()
        assert got["alarm"].sum() > 0  # non-vacuous
        assert (got["cusum"] >= 0).all()


class TestBucketedJoin:
    def test_layout_is_aligned_and_complete(self, ray_session):
        import os

        import pyarrow.parquet as pq

        from kgx.sources import _roundtrip_dir, bucketed_join

        got = bucketed_join(SF).to_pandas()
        # every key lives ONLY in its own bucket directory on both
        # sides — the invariant that makes the exchange-free join sound
        out = _roundtrip_dir(SF, "bucketed")
        for side, col in (("customer", "c_custkey"),
                          ("orders", "o_custkey")):
            for b in range(16):
                d = os.path.join(out, side, "bkt=%d" % b)
                if not os.path.isdir(d):
                    continue
                keys = pq.read_table(d, columns=[col]).to_pandas()[col]
                assert (keys.astype("int64") % 16 == b).all()
        # and the join result matches a driver-side replay
        cust = pq.read_table("%s/customer.parquet" % SF).to_pandas()
        orders = pq.read_table("%s/orders.parquet" % SF).to_pandas()
        orders["cents"] = np.floor(
            orders["o_totalprice"] * 100 + 0.5).astype("int64")
        agg = orders.groupby("o_custkey", as_index=False).agg(
            n_orders=("cents", "size"), sum_cents=("cents", "sum"))
        want = cust.merge(agg, left_on="c_custkey", right_on="o_custkey")
        assert len(got) == len(want)
        g = got.sort_values("custkey").reset_index(drop=True)
        w = want.sort_values("c_custkey").reset_index(drop=True)
        assert (g["n_orders"].to_numpy()
                == w["n_orders"].to_numpy()).all()
        assert (g["sum_cents"].to_numpy()
                == w["sum_cents"].to_numpy()).all()


class TestWordpiece:
    def test_wordpiece_local_replay(self, ray_session):
        import duckdb

        from kgx.traindata import (_wp_encode_word, _wp_pieces,
                                   wordpiece_encode)

        got = wordpiece_encode(SF).to_pandas().sort_values("doc_id") \
            .reset_index(drop=True)
        pieces = _wp_pieces(SF, 4)
        mx = max(len(p) for p in pieces)
        docs = duckdb.sql(
            "SELECT doc_id, text FROM read_parquet('%s/documents.parquet')"
            " ORDER BY doc_id" % SF).df()
        want_tok = [sum(_wp_encode_word(w, pieces, mx)
                        for w in t.split(" ")) for t in docs["text"]]
        assert got["n_wp_tokens"].tolist() == want_tok
        assert (got["n_words"].to_numpy()
                == docs["text"].str.split(" ").str.len().to_numpy()).all()

    def test_wordpiece_longest_match_semantics(self):
        from kgx.traindata import _wp_encode_word

        pieces = {"a", "b", "c", "ab", "abc"}
        assert _wp_encode_word("abc", pieces, 3) == 1   # longest wins
        assert _wp_encode_word("abab", pieces, 3) == 2  # ab + ab
        assert _wp_encode_word("cba", pieces, 3) == 3   # chars only
        # longest-match can beat merge-order BPE: merges (a,b) then
        # (ab,c) leave "xabc" as [x, ab, c] (3) under BPE order if the
        # cursor passed x first, but longest-match takes x, abc (2)
        assert _wp_encode_word("xabc", pieces | {"x"}, 3) == 2

    def test_wordpiece_counts_bounded_by_bpe(self, ray_session):
        # empirical pin on this deterministic corpus: with the
        # inventory built FROM the BPE merges, longest-match never
        # loses to the merge-order walk here (not a theorem — greedy
        # longest-match is not globally optimal in general)
        from kgx.traindata import bpe_encode, wordpiece_encode

        wp = wordpiece_encode(SF).to_pandas().sort_values("doc_id")
        bpe = bpe_encode(SF).to_pandas().sort_values("doc_id")
        assert (wp["n_wp_tokens"].to_numpy()
                <= bpe["n_bpe_tokens"].to_numpy()).all()


class TestZonemapRead:
    def test_pruning_is_real_and_answer_preserving(self, ray_session):
        import pyarrow.parquet as pq

        from kgx.sources import _roundtrip_dir, zonemap_pruned_read

        got = zonemap_pruned_read(SF).to_pandas()
        touched, total = zonemap_pruned_read.last_plan
        # pruning actually skips most of the layout
        assert len(touched) < total / 2
        assert len(touched) >= 1
        # the plan is sound AND minimal for the zones: touched
        # (file, group) entries intersect [200, 280], untouched ones
        # provably cannot — checked across EVERY file of the
        # range-partitioned layout
        import glob
        import os

        layout = _roundtrip_dir(SF, "zonemap")
        files = sorted(os.path.basename(p) for p in
                       glob.glob(os.path.join(layout, "part_*.parquet")))
        assert len(files) > 1  # the layout is actually multi-file
        touched_set = set(touched)
        seen = 0
        for fname in files:
            f = pq.ParquetFile(os.path.join(layout, fname))
            for g in range(f.metadata.num_row_groups):
                rg = f.metadata.row_group(g)
                st = next(rg.column(c).statistics
                          for c in range(rg.num_columns)
                          if rg.column(c).path_in_schema == "n_chars")
                if (fname, g) in touched_set:
                    assert st.min <= 280 and st.max >= 200
                else:
                    assert st.max < 200 or st.min > 280
                seen += 1
        assert seen == total
        # answer == full-scan truth
        import duckdb

        want = duckdb.sql(
            "SELECT count(*) FROM read_parquet("
            "'%s/documents.parquet') WHERE length(text)"
            " BETWEEN 200 AND 280" % SF).fetchone()[0]
        assert len(got) == want

    def test_range_pruned_read_general_multi_file(self, ray_session,
                                                  tmp_path):
        """readers.range_pruned_read — the general promotion of the
        zonemap machinery: over >= 3 files the plan must be minimal
        for the zones and the answer must equal the full scan, on a
        sorted layout AND on an unsorted layout (which degrades to a
        full scan, never a wrong answer)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from kgx.readers import range_pruned_read

        rows = list(range(1000))
        layout = tmp_path / "sorted"
        layout.mkdir()
        for i in range(4):  # 4 range-partitioned sorted files
            part = rows[i * 250:(i + 1) * 250]
            pq.write_table(
                pa.table({"k": pa.array(part, pa.int64()),
                          "v": pa.array([x * 2 for x in part],
                                        pa.int64())}),
                str(layout / ("p%d.parquet" % i)), row_group_size=50)
        lo, hi = 300, 420
        got = range_pruned_read(str(layout), "k", lo, hi,
                                columns=["v"]).to_pandas()
        touched, total = range_pruned_read.last_plan
        assert total == 20
        # minimality: touched zones intersect, untouched provably not
        touched_set = set(touched)
        for i in range(4):
            f = pq.ParquetFile(str(layout / ("p%d.parquet" % i)))
            for g in range(f.metadata.num_row_groups):
                rg = f.metadata.row_group(g)
                st = next(rg.column(c).statistics
                          for c in range(rg.num_columns)
                          if rg.column(c).path_in_schema == "k")
                key = (str(layout / ("p%d.parquet" % i)), g)
                if key in touched_set:
                    assert st.min <= hi and st.max >= lo
                else:
                    assert st.max < lo or st.min > hi
        assert len(touched) == 3  # [300,350) [350,400) [400,450)
        assert sorted(got["v"]) == [2 * x for x in range(lo, hi + 1)]
        # unsorted layout: full scan, same answer
        import random

        shuffled = rows[:]
        random.Random(7).shuffle(shuffled)
        upath = str(tmp_path / "unsorted.parquet")
        pq.write_table(
            pa.table({"k": pa.array(shuffled, pa.int64()),
                      "v": pa.array([x * 2 for x in shuffled],
                                    pa.int64())}),
            upath, row_group_size=100)
        got2 = range_pruned_read(upath, "k", lo, hi).to_pandas()
        assert sorted(got2["v"]) == [2 * x for x in range(lo, hi + 1)]

    def test_range_outside_data_span_returns_empty(self, ray_session):
        from kgx.sources import zonemap_pruned_read

        # no row group intersects [10^9, 2*10^9]: the empty-frame
        # branch must still carry n_chars for the residual filter
        got = zonemap_pruned_read(SF, lo=10 ** 9, hi=2 * 10 ** 9).to_pandas()
        assert len(got) == 0
        touched, total = zonemap_pruned_read.last_plan
        assert touched == [] and total >= 1


class TestTheilSen:
    def test_theil_sen_replay_and_trunc_rule(self, ray_session):
        from kgx.events import dense_daily_counts, theil_sen_daily

        got = theil_sen_daily(SF)
        dense = dense_daily_counts(SF)
        for et, g in dense.groupby("event_type"):
            g = g.sort_values("day")
            days = g["day"].astype(int).tolist()
            v = g["n_events"].astype(int).tolist()
            slopes = []
            for i in range(len(v)):
                for j in range(i + 1, len(v)):
                    num, den = 1000000 * (v[j] - v[i]), days[j] - days[i]
                    q = abs(num) // den
                    slopes.append(q if num >= 0 else -q)
            slopes.sort()
            med = slopes[(len(slopes) - 1) // 2]
            r = got[got["event_type"] == et].iloc[0]
            assert int(r["slope_q6_med"]) == med
            assert int(r["n_pairs"]) == len(slopes)
        assert len(got) == 5
        assert (got["n_pairs"] == got["n_pairs"].iloc[0]).all()


class TestPitJoin:
    def test_pit_containment_and_self_version(self, ray_session):
        import pyarrow.parquet as pq

        from kgx.events import pit_join, scd2_intervals

        got = pit_join(SF).to_pandas()
        iv = scd2_intervals(SF).to_pandas().set_index("event_id")
        ev = pq.read_table("%s/events.parquet" % SF).to_pandas()
        ev["tus"] = ((ev["ts"] - pd.Timestamp(0))
                     // pd.Timedelta(microseconds=1)).astype("int64")
        tus = dict(zip(ev["event_id"].astype(int), ev["tus"]))
        n_purch = int((ev["event_type"] == "purchase").sum())
        assert len(got) == n_purch  # exactly one version per fact
        for r in got.itertuples(index=False):
            v = iv.loc[int(r.version_event_id)]
            t = tus[int(r.event_id)]
            assert v["valid_from_us"] <= t < v["valid_to_us"]
            assert r.age_us == t - v["valid_from_us"]
        # a purchase with no earlier same-user event matches ITSELF
        assert (got["age_us"] >= 0).all()
        self_matched = got[got["event_id"] == got["version_event_id"]]
        assert len(self_matched) > 0 and (self_matched["age_us"] == 0).all()


class TestKsDrift:
    def test_ks_matches_ecdf_replay(self, ray_session):
        import duckdb

        from kgx.textops import ks_drift
        from kgx.traindata import _md5_u64

        got = ks_drift(SF).iloc[0]
        docs = duckdb.sql(
            "SELECT doc_id, length(text) AS v FROM "
            "read_parquet('%s/documents.parquet')" % SF).df()
        a = sorted(v for d, v in zip(docs["doc_id"], docs["v"])
                   if _md5_u64("%d:psi" % d) % 2 == 0)
        b = sorted(v for d, v in zip(docs["doc_id"], docs["v"])
                   if _md5_u64("%d:psi" % d) % 2 == 1)
        na, nb = len(a), len(b)
        best = 0
        for x in sorted(set(a) | set(b)):
            ca = sum(1 for t in a if t <= x)
            cb = sum(1 for t in b if t <= x)
            best = max(best, abs(ca * nb - cb * na))
        assert int(got["d_num"]) == best
        assert int(got["d_den"]) == na * nb
        assert int(got["n_a"]) == na and int(got["n_b"]) == nb
        # same underlying corpus halves → D statistic is small
        assert best / (na * nb) < 0.2


class TestPowerlawAlpha:
    def test_alpha_mle_replay(self, ray_session):
        import math

        from kgx.components import powerlaw_alpha
        from kgx.dedup import jaccard_pairs

        got = powerlaw_alpha(SF).iloc[0]
        e = jaccard_pairs(SF).to_pandas()
        deg = pd.concat([e["doc_id_a"], e["doc_id_b"]]).value_counts()
        n = len(deg)
        s = sum(math.floor(1e6 * math.log(int(d))) for d in deg)
        assert int(got["n_nodes"]) == n
        assert int(got["s_q6"]) == s
        assert int(got["alpha_q6"]) == 1000000 + (10**12 * n) // s
        # exact float alpha within a quantization step
        alpha = 1 + n / sum(math.log(int(d)) for d in deg)
        assert abs(int(got["alpha_q6"]) / 1e6 - alpha) < 1e-3


class TestSilhouette:
    def test_silhouette_pairwise_replay(self, ray_session):
        # the sufficient-statistics shortcut == the O(N²) definition
        import pyarrow.parquet as pq

        from kgx.simsearch import silhouette_eval

        got = silhouette_eval(SF).to_pandas().sort_values("vec_id") \
            .reset_index(drop=True)
        tbl = pq.read_table("%s/embeddings.parquet" % SF).to_pandas()
        tbl = tbl.sort_values("vec_id").reset_index(drop=True)
        X = np.floor(1024.0 * np.array(tbl["embedding"].tolist(),
                                       dtype=np.float64)).astype(np.int64)
        a = got["cluster"].to_numpy("int64")  # trust assignment (oracled)
        D2 = ((X[:, None, :] - X[None, :, :]) ** 2).sum(axis=2)
        for i in range(0, len(X), 37):  # spot-check a spread of rows
            own = a[i]
            mates = np.flatnonzero(a == own)
            sa = int(D2[i, mates].sum())
            da = len(mates) - 1
            best = None
            for c in sorted(set(a.tolist())):
                if c == own:
                    continue
                rows = np.flatnonzero(a == c)
                sc, nc = int(D2[i, rows].sum()), len(rows)
                if best is None or sc * best[2] < best[1] * nc:
                    best = (c, sc, nc)
            bc, sb, db = best
            assert int(got.loc[i, "b_cluster"]) == bc
            if da <= 0:
                assert int(got.loc[i, "s_q6"]) == 0
                continue
            num, den = sb * da - sa * db, max(sa * db, sb * da)
            q = (1000000 * abs(num)) // den
            assert int(got.loc[i, "s_q6"]) == (q if num >= 0 else -q)
        # a clustering should mostly score positive
        assert (got["s_q6"] > 0).mean() > 0.5
        assert got["s_q6"].between(-1000000, 1000000).all()


class TestHrwAssign:
    def test_hrw_stability_under_shard_removal(self, ray_session):
        from kgx.traindata import _md5_u64, hrw_assign

        got = hrw_assign(SF).to_pandas()
        # replay + THE property: dropping shard 3 moves only shard-3 keys
        moved, stayed = 0, 0
        for doc_id, shard in zip(got["doc_id"].astype(int),
                                 got["shard"].astype(int)):
            h = [_md5_u64("%d:shard%d" % (doc_id, s)) for s in range(8)]
            assert int(np.argmax(h)) == shard
            h7 = [x for s, x in enumerate(h) if s != 3]
            new = int(np.argmax(h7))
            new = new if new < 3 else new + 1
            if shard == 3:
                moved += 1
                assert new != 3
            else:
                stayed += 1
                assert new == shard  # untouched keys never move
        assert moved > 0 and stayed > 0


class TestGroupKfold:
    def test_near_dups_share_folds(self, ray_session):
        from kgx.dedup import jaccard_pairs
        from kgx.traindata import group_kfold

        got = group_kfold(SF).to_pandas()
        fold = dict(zip(got["doc_id"].astype(int),
                        got["fold"].astype(int)))
        comp = dict(zip(got["doc_id"].astype(int),
                        got["component"].astype(int)))
        pairs = jaccard_pairs(SF).to_pandas()
        assert len(pairs) > 0
        for a, b in zip(pairs["doc_id_a"].astype(int),
                        pairs["doc_id_b"].astype(int)):
            assert comp[a] == comp[b]  # leakage-safety: same group
            assert fold[a] == fold[b]  # ⇒ same fold
        assert len(got) == 500
        assert got["fold"].nunique() == 5  # all folds populated


class TestSceneCuts:
    def test_sad_replay_from_decoded_frames(self, ray_session):
        import duckdb

        from kgx.multimodal import decode_y4m, encode_y4m, scene_cuts

        got = scene_cuts(SF).to_pandas()
        docs = duckdb.sql(
            "SELECT doc_id, text FROM read_parquet("
            "'%s/documents.parquet') LIMIT 20" % SF).df()
        for doc_id, text in zip(docs["doc_id"].astype(int),
                                docs["text"]):
            fr = decode_y4m(encode_y4m(text.encode())).astype(np.int64)
            g = got[got["doc_id"] == doc_id].sort_values("frame_idx")
            assert len(g) == fr.shape[0] - 1
            for r in g.itertuples(index=False):
                want = int(np.abs(fr[int(r.frame_idx)]
                                  - fr[int(r.frame_idx) - 1]).sum())
                assert int(r.sad) == want
                assert int(r.is_cut) == (1 if want > 4096 else 0)
        # both classes present: the detector separates content deltas
        # (real text) from padding deltas (tail frames)
        assert 0 < got["is_cut"].mean() < 1


class TestAmsF2:
    def test_ams_estimates_true_f2(self, ray_session):
        import duckdb

        from kgx.traindata import ams_f2

        got = ams_f2(SF)
        assert len(got) == 16
        assert (got["z2"] == got["z_sum"] ** 2).all()
        truth = duckdb.sql(
            "SELECT sum(c * c) FROM (SELECT count(*) AS c FROM ("
            "SELECT unnest(string_split(text, ' ')) AS tok FROM "
            "read_parquet('%s/documents.parquet')) GROUP BY tok)"
            % SF).fetchone()[0]
        est = got["z2"].mean()
        assert abs(est - truth) / truth < 0.5  # 16-sketch variance bound


class TestClassifierAgreement:
    def test_kappa_replay_and_chance_exposure(self, ray_session):
        import duckdb

        from kgx.textops import classifier_agreement
        from kgx.traindata import naive_bayes_langid

        got = classifier_agreement(SF).iloc[0]
        a = duckdb.sql(
            "SELECT doc_id, lang FROM read_parquet("
            "'%s/documents.parquet')" % SF).df() \
            .set_index("doc_id")["lang"]
        b = naive_bayes_langid(SF).to_pandas() \
            .set_index("doc_id")["nb_pred"]
        j = pd.DataFrame({"a": a, "b": b}).dropna()
        n = len(j)
        diag = int((j["a"] == j["b"]).sum())
        rm = j["a"].value_counts()
        cm = j["b"].value_counts()
        pe = sum(int(rm[l]) * int(cm[l])
                 for l in set(rm.index) & set(cm.index))
        assert int(got["n_docs"]) == n
        assert int(got["n_agree"]) == diag
        assert int(got["pe_num"]) == pe
        num, den = 1000000 * (n * diag - pe), n * n - pe
        q = abs(num) // den
        assert int(got["kappa_q6"]) == (q if num >= 0 else -q)
        # the corpus labels are text-independent: raw accuracy looks
        # "above chance" (33% vs 20% uniform) but kappa exposes the
        # prior-matching floor — agreement is chance-level
        assert diag / n > 0.25
        assert abs(int(got["kappa_q6"])) < 100000  # |kappa| < 0.1


class TestRankStability:
    def test_tau_identities(self, ray_session):
        from kgx.textops import rank_stability

        got = rank_stability(SF).iloc[0]
        n, np_, c, d = (int(got["n_terms"]), int(got["n_pairs"]),
                        int(got["concordant"]), int(got["discordant"]))
        assert np_ == n * (n - 1) // 2
        assert c + d == np_
        num = 1000000 * (c - d)
        q = abs(num) // np_
        assert int(got["tau_q6"]) == (q if num >= 0 else -q)
        # the templated corpus's near-uniform term counts make the
        # between-half rank order noise-dominated: tau is honestly
        # near zero here (0.063 at sf0.001, deterministic) — the
        # metric *detecting* churn is the point; bounds still hold
        assert -1000000 <= int(got["tau_q6"]) <= 1000000


class TestDeltaDedup:
    def test_delta_dedup_replay_and_bucket_isolation(self, ray_session):
        import os

        import duckdb
        import pyarrow.parquet as pq

        from kgx.sources import _roundtrip_dir, delta_dedup
        from kgx.traindata import _md5_u64

        got = delta_dedup(SF).to_pandas()
        docs = duckdb.sql(
            "SELECT doc_id, array_to_string(string_split(text,' ')[1:5],"
            " ' ') AS key FROM read_parquet('%s/documents.parquet')"
            % SF).df()
        key = dict(zip(docs["doc_id"].astype(int), docs["key"]))
        want = {}
        for i in sorted(k for k in key if k % 2 == 1):
            cands = [j for j in key
                     if key[j] == key[i] and (j % 2 == 0 or j < i)]
            want[i] = min(cands) if cands else -1
        got_d = dict(zip(got["doc_id"].astype(int),
                         got["dup_of"].astype(int)))
        assert got_d == want
        assert (got["is_dup"] == (got["dup_of"] >= 0).astype(int)).all()
        assert got["is_dup"].sum() > 0  # non-vacuous
        # base bucket isolation: every key hashed to its directory
        import hashlib

        out = _roundtrip_dir(SF, "deltadedup")
        for b in range(16):
            d = os.path.join(out, "base", "bkt=%d" % b)
            if not os.path.isdir(d):
                continue
            ks = pq.read_table(d, columns=["key"]).to_pandas()["key"]
            assert all(_md5_u64(k) % 16 == b for k in ks)


class TestBloomSemijoin:
    def test_no_false_negatives_and_ledger(self, ray_session):
        import duckdb

        from kgx.relational import bloom_semijoin

        got = bloom_semijoin(SF).iloc[0]
        truth = duckdb.sql(
            "SELECT count(*), sum(CASE WHEN o_custkey IN ("
            "SELECT c_custkey FROM read_parquet('%s/customer.parquet')"
            " WHERE c_mktsegment = 'BUILDING') THEN 1 ELSE 0 END)"
            " FROM read_parquet('%s/orders.parquet')"
            % (SF, SF)).fetchone()
        n_orders, n_true = int(truth[0]), int(truth[1])
        assert int(got["n_orders"]) == n_orders
        # Bloom guarantee: every true match passes (no false negatives)
        assert int(got["n_true_match"]) == n_true
        assert (int(got["n_pass_bloom"])
                == int(got["n_true_match"])
                + int(got["n_false_positive"]))
        # the reduction actually prunes most of the big side
        assert int(got["n_pass_bloom"]) < n_orders


class TestMerkleRanges:
    def test_drilldown_consistent_with_cdc_truth(self, ray_session):
        from kgx.sources import merkle_ranges
        from kgx.traindata import _md5_u64

        got = merkle_ranges(SF)
        # true changed key set under the sparse :mk rule
        changed_keys = set()
        for d in range(500):
            r = _md5_u64("%d:mk" % d) % 100
            if r in (0, 1):
                changed_keys.add(d)
            if r == 2:
                changed_keys.add(d + 1_000_000_000)
        changed_leaves = {k // 8 for k in changed_keys}
        leaves = got[got["level"] == 0]
        flagged = set(leaves.loc[leaves["differs"] == 1, "range_id"]
                      .astype(int))
        # no false positives: an unflagged leaf contains no change
        for rid in set(leaves["range_id"].astype(int)) - flagged:
            assert rid not in changed_leaves
        # and every flagged leaf really contains a change
        assert flagged == changed_leaves
        # drill-down: every differing leaf's parent differs
        parents = got[got["level"] == 1]
        pdiff = set(parents.loc[parents["differs"] == 1, "range_id"]
                    .astype(int))
        assert {r // 8 for r in flagged} == pdiff
        assert len(pdiff) < len(parents)  # parents prune the drill-down
        # reconciliation transfers a fraction of the ranges
        assert 0 < len(flagged) < len(leaves)


class TestMannKendall:
    def test_mk_replay_and_kendall_consistency(self, ray_session):
        from kgx.events import dense_daily_counts, mann_kendall

        got = mann_kendall(SF)
        dense = dense_daily_counts(SF)
        for et, g in dense.groupby("event_type"):
            v = [int(x) for x in g.sort_values("day")["n_events"]]
            n = len(v)
            s = sum((v[j] > v[i]) - (v[j] < v[i])
                    for i in range(n) for j in range(i + 1, n))
            r = got[got["event_type"] == et].iloc[0]
            assert int(r["s_stat"]) == s
            assert int(r["n_days"]) == n
            # |S| bounded by untied pair count; var positive
            assert abs(s) <= n * (n - 1) // 2
            assert int(r["var18"]) > 0


class TestDiameterEstimate:
    def test_double_sweep_bound_properties(self, ray_session):
        from collections import deque

        from kgx.components import diameter_estimate
        from kgx.simsearch import knn_graph

        got = diameter_estimate(SF).iloc[0]
        e = knn_graph(SF).to_pandas()
        adj: dict = {}
        for a, b in zip(e["vec_id"].astype(int),
                        e["neighbor_id"].astype(int)):
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)

        def bfs(src):
            dist = {src: 0}
            dq = deque([src])
            while dq:
                u = dq.popleft()
                for v in adj.get(u, ()):
                    if v not in dist:
                        dist[v] = dist[u] + 1
                        dq.append(v)
            return dist

        d1 = bfs(int(got["start_node"]))
        assert int(got["sweep1_ecc"]) == max(d1.values())
        far = min(n for n, d in d1.items()
                  if d == int(got["sweep1_ecc"]))
        assert int(got["far_node"]) == far
        d2 = bfs(far)
        assert int(got["sweep2_ecc"]) == max(d2.values())
        # the second sweep's eccentricity is the better (>=) bound
        assert int(got["sweep2_ecc"]) >= int(got["sweep1_ecc"])
        # the SQL oracle bounds both walks at depth 16 (WHERE w.d < 16)
        # while the engine BFS is unbounded: if the graph's true
        # eccentricity ever reaches the cap at a larger SF the oracle
        # silently under-reports — fail loudly here instead
        assert max(d1.values()) < 16 and max(d2.values()) < 16, (
            "k-NN graph eccentricity reached the oracle's depth-16 cap; "
            "raise the WHERE w.d < N bound in DOC_ORACLES['diameter_estimate']")


class TestDbscan:
    def test_dbscan_gate_matches_distributed(self, ray_session):
        from kgx.dedup import dbscan_clusters

        gate = dbscan_clusters(SF)
        gate = (gate.to_pandas() if hasattr(gate, "to_pandas")
                else gate)
        dist = dbscan_clusters(SF, small_graph_threshold=0).to_pandas()
        key = lambda df: set(map(tuple, df[["vec_id", "role",
                                            "cluster"]].values))
        assert key(gate) == key(dist)

    def test_dbscan_invariants(self, ray_session):
        from kgx.dedup import dbscan_clusters, embedding_near_dup

        got = dbscan_clusters(SF)
        got = got.to_pandas() if hasattr(got, "to_pandas") else got
        pairs = embedding_near_dup(SF, threshold=0.35).to_pandas()
        deg: dict = {}
        adj: dict = {}
        for a, b in zip(pairs["vec_id_a"].astype(int),
                        pairs["vec_id_b"].astype(int)):
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        role = dict(zip(got["vec_id"].astype(int),
                        got["role"].astype(int)))
        clus = dict(zip(got["vec_id"].astype(int),
                        got["cluster"].astype(int)))
        assert len(got) == 500
        for v, r in role.items():
            if r == 1:
                assert deg.get(v, 0) >= 3
                assert clus[v] >= 0
            elif r == 2:
                assert deg.get(v, 0) < 3
                assert any(role[u] == 1 for u in adj.get(v, ()))
                # border label = min neighbouring core's cluster
                assert clus[v] == min(clus[u] for u in adj[v]
                                      if role[u] == 1)
            else:
                assert not any(role[u] == 1 for u in adj.get(v, ()))
                assert clus[v] == -1
        # core-core edges never cross clusters
        for a, b in zip(pairs["vec_id_a"].astype(int),
                        pairs["vec_id_b"].astype(int)):
            if role[a] == 1 and role[b] == 1:
                assert clus[a] == clus[b]
        assert {0, 1, 2} <= set(role.values())  # all roles present


class TestPseudonymize:
    def test_referential_integrity(self, ray_session):
        import re

        from kgx.textops import pseudonymize

        got = pseudonymize(SF).to_pandas()
        sur = re.compile(r"user\d+@anon\.example")
        # the shared identity admin@test.org maps to ONE surrogate
        shared = set()
        for doc_id, t in zip(got["doc_id"].astype(int), got["pseudo"]):
            if doc_id % 7 == 0:
                shared.update(m for m in sur.findall(t)
                              if t.endswith(m))
        assert len(shared) == 1
        # distinct per-doc identities stay distinct
        per_doc = {}
        for doc_id, t in zip(got["doc_id"].astype(int), got["pseudo"]):
            if doc_id % 5 == 0:
                per_doc[doc_id] = sur.findall(t)[0]
        assert len(set(per_doc.values())) == len(per_doc)
        # no raw email survives
        raw = re.compile(r"@example\.com|@test\.org")
        assert not any(raw.search(t) for t in got["pseudo"])


class TestMaxStreak:
    def test_streak_replay(self, ray_session):
        import pyarrow.parquet as pq

        from kgx.events import max_streak

        got = max_streak(SF).to_pandas()
        ev = pq.read_table("%s/events.parquet" % SF).to_pandas()
        ev["day"] = (((ev["ts"] - pd.Timestamp(0))
                      // pd.Timedelta(microseconds=1))
                     // 86400000000).astype("int64")
        for uid, g in ev.groupby("user_id"):
            days = sorted(set(g["day"]))
            best = run = 1
            for a, b in zip(days, days[1:]):
                run = run + 1 if b == a + 1 else 1
                best = max(best, run)
            r = got[got["user_id"] == uid].iloc[0]
            assert int(r["n_active_days"]) == len(days)
            assert int(r["max_streak"]) == best
        assert (got["max_streak"] <= got["n_active_days"]).all()


class TestHllSliding:
    def test_window_estimates_track_exact(self, ray_session):
        import pyarrow.parquet as pq

        from kgx.traindata import hll_sliding_users

        got = hll_sliding_users(SF)
        ev = pq.read_table("%s/events.parquet" % SF).to_pandas()
        ev["day"] = (((ev["ts"] - pd.Timestamp(0))
                      // pd.Timedelta(microseconds=1))
                     // 86400000000).astype("int64")
        for r in got.itertuples(index=False):
            w = int(r.win_start_day)
            truth = ev[(ev["day"] >= w) & (ev["day"] <= w + 6)] \
                ["user_id"].nunique()
            if truth:
                assert abs(int(r.est_distinct) - truth) / truth < 0.25
        assert len(got) >= 10  # real sliding coverage


class TestModularity:
    def test_modularity_replay_and_quality(self, ray_session):
        from kgx.components import label_propagation, modularity_score
        from kgx.dedup import jaccard_pairs

        got = modularity_score(SF).iloc[0]
        lp = label_propagation(SF)
        lp = lp.to_pandas() if hasattr(lp, "to_pandas") else lp
        lab = dict(zip(lp["doc_id"].astype(int),
                       lp["label"].astype(int)))
        e = jaccard_pairs(SF).to_pandas()
        m = len(e)
        ec: dict = {}
        dc: dict = {}
        for a, b in zip(e["doc_id_a"].astype(int),
                        e["doc_id_b"].astype(int)):
            la, lb = lab[a], lab[b]
            dc[la] = dc.get(la, 0) + 1
            dc[lb] = dc.get(lb, 0) + 1
            if la == lb:
                ec[la] = ec.get(la, 0) + 1
        q_num = sum(4 * m * ec.get(c, 0) - d * d for c, d in dc.items())
        assert int(got["q_num"]) == q_num
        assert int(got["m_edges"]) == m
        assert int(got["q_den"]) == 4 * m * m
        # dup clusters are near-cliques: strong community structure
        assert q_num / (4 * m * m) > 0.5


class TestSkosRepair:
    SKOS = "http://www.w3.org/2004/02/skos/core#"

    def _graph(self):
        import pyarrow as pa
        import ray.data

        from kgx.schemas import GRAPH

        S = self.SKOS
        u = "http://x/%s"
        broader, in_s, top = (S + "broader", S + "inScheme",
                              S + "topConceptOf")
        rows = []
        # 2-cycle A1<->A2; 3-ring R1->R2->R3->R1; self-loop SL;
        # L: in scheme, no broader; T: already a top concept
        for s, p, o in [
            ("A1", broader, u % "A2"), ("A2", broader, u % "A1"),
            ("R1", broader, u % "R2"), ("R2", broader, u % "R3"),
            ("R3", broader, u % "R1"),
            ("SL", broader, u % "SL"),
            ("A1", in_s, "http://x/sch"), ("A2", in_s, "http://x/sch"),
            ("R1", in_s, "http://x/sch"), ("R2", in_s, "http://x/sch"),
            ("R3", in_s, "http://x/sch"), ("SL", in_s, "http://x/sch"),
            ("L", in_s, "http://x/sch"),
            ("T", in_s, "http://x/sch"), ("T", top, "http://x/sch"),
        ]:
            rows.append({"subj": u % s, "pred": p, "obj": o,
                         "obj_is_literal": False, "obj_lang": None,
                         "obj_datatype": None})
        return ray.data.from_arrow(pa.Table.from_pylist(rows,
                                                        schema=GRAPH))

    def test_rules_and_local_vs_distributed_pin(self, ray_session):
        from kgx.components import skos_repair

        S = self.SKOS
        u = "http://x/%s"
        local = skos_repair(self._graph()).to_pandas()
        dist = skos_repair(self._graph(),
                           small_graph_threshold=0).to_pandas()
        key = ["subj", "pred", "obj"]
        a = local[key].sort_values(key).reset_index(drop=True)
        b = dist[key].sort_values(key).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)

        kept = set(zip(local.loc[local["pred"] == S + "broader", "subj"],
                       local.loc[local["pred"] == S + "broader", "obj"]))
        # within each SCC only string-increasing edges survive; the
        # self-loop always drops; the result is acyclic
        assert kept == {(u % "A1", u % "A2"), (u % "R1", u % "R2"),
                        (u % "R2", u % "R3")}
        tops = set(local.loc[local["pred"] == S + "topConceptOf",
                             "subj"])
        # orphans: lost-their-only-edge A2/R3, self-loop SL, edgeless
        # L; NOT A1/R1/R2 (kept edges) and NOT T (already marked)
        assert tops == {u % "A2", u % "R3", u % "SL", u % "L",
                        u % "T"}  # T's original row passes through
        added_has_top = set(
            local.loc[local["pred"] == S + "hasTopConcept", "obj"])
        assert added_has_top == {u % "A2", u % "R3", u % "SL", u % "L"}
        # non-broader rows pass through untouched
        assert (local["pred"] == S + "inScheme").sum() == 8


class TestPercolationCurve:
    def test_monotone_in_threshold(self, ray_session):
        from kgx.dedup import jaccard_pairs, percolation_curve

        got = percolation_curve(SF)
        assert got["thr_pct"].tolist() == [50, 60, 70, 80, 90]
        # raising the threshold only removes edges/mass
        for col in ("n_edges", "n_touched", "max_component"):
            v = got[col].to_numpy()
            assert (v[:-1] >= v[1:]).all(), col
        # the 80% row agrees with the independently-oracled pair stage
        e80 = jaccard_pairs(SF).to_pandas()
        assert int(got.loc[got["thr_pct"] == 80, "n_edges"].iloc[0]) \
            == len(e80)
        assert (got["n_components"] <= got["n_touched"]).all()

    def test_distributed_summary_matches_local_truth(self, ray_session):
        # the per-batch-combiner + bucket co-group summary (the fix for
        # the driver round-trip of the pair graph) must agree with a
        # local union-find over the same pair set at the DENSEST sweep
        # point — the percolation regime the old code OOMed in
        from kgx.dedup import jaccard_pairs, percolation_curve

        got = percolation_curve(SF, thresholds=(50,)).iloc[0]
        e = jaccard_pairs(SF, 0.5).to_pandas()
        parent: dict = {}

        def find(x):
            while parent.get(x, x) != x:
                parent[x] = parent.get(parent[x], parent[x])
                x = parent[x]
            return x

        for a, b in zip(e["doc_id_a"].astype(int),
                        e["doc_id_b"].astype(int)):
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        nodes = set(e["doc_id_a"].astype(int)) \
            | set(e["doc_id_b"].astype(int))
        sizes: dict = {}
        for n in nodes:
            r = find(n)
            sizes[r] = sizes.get(r, 0) + 1
        assert int(got["n_edges"]) == len(e)
        assert int(got["n_touched"]) == len(nodes)
        assert int(got["n_components"]) == len(sizes)
        assert int(got["max_component"]) == max(sizes.values())


class TestMutualInformation:
    def test_cell_replay_and_mi_laws(self, ray_session):
        import math

        import duckdb

        from kgx.textops import mutual_information

        got = mutual_information(SF)
        got = got.to_pandas() if hasattr(got, "to_pandas") else got
        t = duckdb.sql(
            "SELECT lang, source, count(*) AS n FROM read_parquet("
            "'%s/documents.parquet') GROUP BY lang, source" % SF).df()
        N = int(t["n"].sum())
        ni = t.groupby("lang")["n"].sum()
        mj = t.groupby("source")["n"].sum()
        assert len(got) == len(t)
        for r in got.itertuples():
            n = int(t[(t["lang"] == r.lang)
                      & (t["source"] == r.source)]["n"].iloc[0])
            want = n * math.floor(1048576.0 * math.log(
                float(n * N) / float(int(ni[r.lang])
                                     * int(mj[r.source]))))
            assert int(r.mi_term_q20) == want
            assert int(r.n_ij) == n
        # plug-in MI is >= 0 up to quantization (each floor loses
        # < 2^-20 nats per observation)
        mi_nats = got["mi_term_q20"].sum() / (N * 1048576.0)
        assert mi_nats > -1e-5
        assert mi_nats < math.log(min(t["lang"].nunique(),
                                      t["source"].nunique())) + 1e-9


class TestW1Drift:
    def test_w1_laws_and_local_replay(self, ray_session):
        from kgx.events import dense_daily_counts, w1_drift

        got = w1_drift(SF)
        got = got.to_pandas() if hasattr(got, "to_pandas") else got
        dense = dense_daily_counts(SF)
        dense = dense.to_pandas() if hasattr(dense, "to_pandas") \
            else dense
        piv = dense.pivot(index="day", columns="event_type",
                          values="n_events").sort_index()
        cum = piv.cumsum()
        tot = piv.sum()
        assert len(got) == 10  # C(5,2) type pairs
        for r in got.itertuples():
            want = int(np.abs(
                cum[r.type_a].to_numpy("int64") * int(tot[r.type_b])
                - cum[r.type_b].to_numpy("int64")
                * int(tot[r.type_a])).sum())
            assert int(r.w1_num) == want
            assert r.type_a < r.type_b  # canonical pair order
        # metric laws on the normalized value: nonneg; identical
        # distributions would give 0 (none here — all pairs positive)
        assert (got["w1_num"] >= 0).all()
        assert (got["w1_num"] > 0).all()


class TestBurstIntervals:
    def test_viterbi_replay_and_optimality(self, ray_session):
        import math

        from kgx.events import burst_intervals, dense_daily_counts

        got = burst_intervals(SF)
        dense = dense_daily_counts(SF)
        G = 2_000_000
        for et, g in dense.groupby("event_type"):
            v = [int(x) for x in g.sort_values("day")["n_events"]]
            D, S = len(v), sum(v)
            lam = [(1000000 * S) // D, (1000000 * 6 * S) // (5 * D)]
            lnS = [math.log(S), math.log(6 * S)]
            lnD = [math.log(D), math.log(5 * D)]

            def cost(c, j):
                return lam[j] - math.floor(
                    1000000.0 * (c * (lnS[j] - lnD[j])))

            # brute-force optimal path over all 2^D sequences is
            # infeasible; verify the DP invariant instead: the engine
            # path's total cost equals min(c0, c1) at the end
            e = got[got["event_type"] == et].sort_values("day")
            states = e["state"].tolist()
            total = cost(v[0], states[0]) + (G if states[0] == 1 else 0)
            for t in range(1, D):
                total += cost(v[t], states[t])
                if states[t - 1] == 0 and states[t] == 1:
                    total += G
            assert total == min(int(e["c0"].iloc[-1]),
                                int(e["c1"].iloc[-1]))
        # the labeling is selective, not vacuous and not everything
        frac = got["state"].mean()
        assert 0 < frac < 0.5


class TestCoordinatedSample:
    def test_referential_completeness(self, ray_session):
        from kgx.relational import coordinated_sample

        got = coordinated_sample(SF).iloc[0]
        # the join-preservation property: every sampled lineitem's
        # order is in the sample (independent sampling would not give
        # n_joined == n_lineitems)
        assert int(got["n_joined"]) == int(got["n_lineitems"])
        assert int(got["n_orders"]) > 0
        assert int(got["revenue_cents"]) > 0


class TestLearnedIndex:
    def test_fit_matches_numpy_and_bound_holds(self, ray_session):
        import duckdb

        from kgx.textops import learned_index_audit

        got = learned_index_audit(SF).iloc[0]
        lens = duckdb.sql(
            "SELECT length(text) AS x FROM read_parquet("
            "'%s/documents.parquet')" % SF).df()["x"].to_numpy(float)
        xs = np.sort(lens)
        ranks = np.searchsorted(xs, xs, side="left").astype(float)
        b, a = np.polyfit(xs, ranks, 1)
        assert abs(int(got["b_q6"]) / 1e6 - b) < 1e-3
        assert abs(int(got["a_q6"]) / 1e6 - a) < 2.0  # intercept scale
        # the reported window really bounds every prediction error
        pred = a + b * xs
        worst = np.abs(pred - ranks).max()
        assert abs(int(got["max_err_rows_q6"]) / 1e6 - worst) < 0.01
        # and the model is useful: window << n
        assert int(got["max_err_rows_q6"]) < 1e6 * int(got["n"]) / 4


class TestZorder:
    def test_zorder_locality_beats_1d_sort(self, ray_session):
        from kgx.sources import zorder_values

        got = zorder_values(SF).to_pandas()
        # interleave replay on a few rows
        for r in got.head(20).itertuples(index=False):
            xb, yb = int(r.x) >> 10, int(r.y) >> 10
            z = 0
            for i in range(10):
                z |= ((xb >> i) & 1) << (2 * i)
                z |= ((yb >> i) & 1) << (2 * i + 1)
            assert z == int(r.zval)
        box = got[got["in_box"] == 1]
        assert 0 < len(box) < len(got)

        def blocks_touched(order_col, rows_per_block=16):
            rk = got.sort_values(order_col).reset_index(drop=True)
            return len(set(rk.index[rk["in_box"] == 1]
                           // rows_per_block))

        # the data-skipping metric: 16-row blocks a box query must
        # open. Z-order never loses to either single-axis sort and
        # clearly beats the scattered axis (9 vs 10/13 at sf0.001;
        # the margin widens with corpus size)
        z = blocks_touched("zval")
        assert z <= blocks_touched("x")
        assert z < blocks_touched("y")


class TestAnovaF:
    def test_anova_matches_float_replay(self, ray_session):
        import duckdb

        from kgx.textops import anova_f

        got = anova_f(SF).iloc[0]
        df = duckdb.sql(
            "SELECT lang, length(text) AS x FROM read_parquet("
            "'%s/documents.parquet')" % SF).df()
        n, k = len(df), df["lang"].nunique()
        grand = df["x"].mean()
        ssb = sum(len(g) * (g["x"].mean() - grand) ** 2
                  for _, g in df.groupby("lang"))
        ssw = sum(((g["x"] - g["x"].mean()) ** 2).sum()
                  for _, g in df.groupby("lang"))
        f = (ssb / (k - 1)) / (ssw / (n - k))
        assert int(got["k"]) == k and int(got["n"]) == n
        assert abs(int(got["ssb_q2"]) / 100 - ssb) < 1.0
        assert abs(int(got["ssw_q2"]) / 100 - ssw) < 1.0
        assert abs(int(got["f_q6"]) / 1e6 - f) < 1e-4


class TestKtruss:
    def test_truss_invariants_and_convergence(self, ray_session):
        from kgx.components import ktruss
        from kgx.dedup import jaccard_pairs

        got = ktruss(SF)
        got = got.to_pandas() if hasattr(got, "to_pandas") else got
        all_e = jaccard_pairs(SF).to_pandas()
        assert 0 < len(got) < len(all_e)  # real peeling happened
        # every surviving edge's support is its triangle count in the
        # surviving subgraph, and meets the truss bar (converged)
        adj: dict = {}
        for a, b in zip(got["a"].astype(int), got["b"].astype(int)):
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        for r in got.itertuples(index=False):
            want = len(adj[int(r.a)] & adj[int(r.b)])
            assert int(r.support) == want
            assert want >= 2  # k=4 ⇒ support ≥ k−2 at the fixpoint
        # fixed-round == fixed-round+1 (fixpoint inside 3 rounds)
        again = ktruss(SF, rounds=4)
        again = (again.to_pandas() if hasattr(again, "to_pandas")
                 else again)
        key = lambda df: set(map(tuple, df[["a", "b", "support"]]
                                 .values))
        assert key(got) == key(again)

    def test_truss_gate_matches_distributed(self, ray_session):
        from kgx.components import ktruss

        gate = ktruss(SF)
        gate = gate.to_pandas() if hasattr(gate, "to_pandas") else gate
        dist = ktruss(SF, small_graph_threshold=0)
        dist = dist.to_pandas() if hasattr(dist, "to_pandas") else dist
        key = lambda df: set(map(tuple, df[["a", "b", "support"]]
                                 .values))
        assert key(gate) == key(dist)


class TestWavFrameFeatures:
    def test_frame_replay_from_decoded_samples(self, ray_session):
        import duckdb

        from kgx.multimodal import (decode_wav, encode_wav,
                                    wav_frame_features)

        got = wav_frame_features(SF).to_pandas()
        docs = duckdb.sql(
            "SELECT doc_id, text FROM read_parquet("
            "'%s/documents.parquet') LIMIT 15" % SF).df()
        for doc_id, text in zip(docs["doc_id"].astype(int),
                                docs["text"]):
            s = decode_wav(encode_wav(text.encode())).astype(np.int64)
            g = got[got["doc_id"] == doc_id].sort_values("frame_idx")
            assert len(g) == -(-len(s) // 64)
            for r in g.itertuples(index=False):
                w = s[int(r.frame_idx) * 64:(int(r.frame_idx) + 1) * 64]
                assert int(r.energy) == int((w * w).sum())
                c = w - 20000
                assert int(r.zcr) == int((c[:-1] * c[1:] < 0).sum())
        assert (got["zcr"] > 0).any() and (got["energy"] > 0).all()


class TestBmpDhash:
    def test_dhash_replay_and_perceptual_property(self, ray_session):
        from kgx.multimodal import bmp_dhash, decode_bmp, encode_bmp

        got = bmp_dhash(SF).to_pandas()
        assert len(got) == 500
        assert got["dhash_q"].between(0, (1 << 31) - 1).all()
        # replay a few + the PERCEPTUAL property: doubling brightness
        # (scaling every byte) keeps the hash identical, while byte
        # hashing would change completely
        sample = got.head(10)
        for r in sample.itertuples(index=False):
            import duckdb

            text = duckdb.sql(
                "SELECT text FROM read_parquet("
                "'%s/documents.parquet') WHERE doc_id = %d"
                % (SF, int(r.doc_id))).fetchone()[0]
            img = decode_bmp(encode_bmp(text.encode())).astype(np.int64)
            col = img.sum(axis=(0, 2))
            h = 0
            for b in (col[:-1] > col[1:]).astype(int):
                h = (h << 1) | int(b)
            assert h == int(r.dhash_q)
            # brightness-scaled image: same gradient signs
            col2 = col * 2
            h2 = 0
            for b in (col2[:-1] > col2[1:]).astype(int):
                h2 = (h2 << 1) | int(b)
            assert h2 == h
        assert got["dhash_q"].nunique() > 400  # discriminative


class TestKeyframes:
    def test_keyframes_compose_cuts(self, ray_session):
        from kgx.multimodal import keyframes, scene_cuts

        kf = keyframes(SF).to_pandas()
        cuts = scene_cuts(SF).to_pandas()
        want = set()
        for doc_id in kf["doc_id"].unique():
            want.add((int(doc_id), 0))
        for r in cuts[cuts["is_cut"] == 1].itertuples(index=False):
            want.add((int(r.doc_id), int(r.frame_idx)))
        got = set(zip(kf["doc_id"].astype(int),
                      kf["frame_idx"].astype(int)))
        assert got == want
        # a real temporal downsample: strictly fewer than all frames
        total_frames = len(cuts) + kf["doc_id"].nunique()
        assert len(kf) < total_frames


class TestRichClub:
    def test_rich_club_replay_and_paths_agree(self, ray_session):
        from kgx.components import rich_club
        from kgx.dedup import jaccard_pairs

        got = rich_club(SF)
        dist = rich_club(SF, small_graph_threshold=0)
        assert got.astype("int64").equals(dist.astype("int64"))
        e = jaccard_pairs(SF).to_pandas()
        deg = pd.concat([e["doc_id_a"], e["doc_id_b"]]).value_counts()
        for r in got.itertuples(index=False):
            rich = set(deg[deg > int(r.k)].index.astype(int))
            ek = sum(1 for a, b in zip(e["doc_id_a"].astype(int),
                                       e["doc_id_b"].astype(int))
                     if a in rich and b in rich)
            assert int(r.n_rich) == len(rich)
            assert int(r.e_rich) == ek
        # density among hubs rises with the cutoff (club effect)
        assert got["phi_q6"].is_monotonic_increasing


class TestPairEditStats:
    def test_lev_fuzz_and_metric_axioms(self, ray_session):
        import random

        from kgx.dedup import _lev, pair_edit_stats

        from kgx.dedup import _lev_myers

        rng = random.Random(11)
        for _ in range(200):
            a = "".join(rng.choice("abx ") for _ in range(rng.randint(0, 14)))
            b = "".join(rng.choice("abx ") for _ in range(rng.randint(0, 14)))
            d = _lev(a, b)
            assert d == _lev_myers(a, b)  # both implementations agree
            assert d == _lev(b, a)  # symmetry
            assert d >= abs(len(a) - len(b))  # length lower bound
            assert d <= max(len(a), len(b))  # replacement upper bound
            if a == b:
                assert d == 0
        got = pair_edit_stats(SF).to_pandas()
        assert len(got) > 1000
        assert (got["lev"] >= (got["len_a"] - got["len_b"]).abs()).all()
        assert (got["lev"]
                <= got[["len_a", "len_b"]].max(axis=1)).all()
        assert (got["lev"] > 0).all()  # corpus texts are unique


class TestWilsonBounds:
    def test_wilson_interval_properties(self, ray_session):
        import math

        from kgx.events import wilson_bounds

        got = wilson_bounds(SF)
        assert len(got) > 10
        for r in got.itertuples(index=False):
            n, s = int(r.n_trials), int(r.n_success)
            root = math.sqrt(s * (n - s) / n + 1.0)
            lo = math.floor(1e6 * ((s + 2 - 2 * root) / (n + 4)))
            hi = math.floor(1e6 * ((s + 2 + 2 * root) / (n + 4)))
            assert int(r.lo_q6) == lo and int(r.hi_q6) == hi
            # the interval brackets the point estimate
            p_q6 = 1e6 * s / n
            assert lo <= p_q6 <= hi + 1
            assert 0 <= lo <= hi <= 1000000


class TestHistOverlap:
    def test_overlap_identities(self, ray_session):
        import duckdb

        from kgx.textops import hist_overlap

        got = hist_overlap(SF)
        assert len(got) == 10  # C(5,2) language pairs
        assert got["ovl_ppm"].between(0, 1000000).all()
        # direct replay of one pair
        df = duckdb.sql(
            "SELECT lang, length(text) AS v FROM read_parquet("
            "'%s/documents.parquet')" % SF).df()
        r = got.iloc[0]
        a = df[df["lang"] == r["lang_a"]]["v"].value_counts()
        b = df[df["lang"] == r["lang_b"]]["v"].value_counts()
        na, nb = int(a.sum()), int(b.sum())
        s = sum(min(int(a.get(v, 0)) * nb, int(b.get(v, 0)) * na)
                for v in set(a.index) | set(b.index))
        assert int(r["ovl_ppm"]) == (1000000 * s) // (na * nb)
        # small per-lang samples over a wide length domain: overlaps
        # are modest but uniformly nonzero (6.7%-22% at sf0.001) and
        # never total
        assert got["ovl_ppm"].min() > 0
        assert got["ovl_ppm"].max() < 1000000
