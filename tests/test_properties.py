# encoding=utf-8
"""Property-based tests (hypothesis) for the order-sensitive parsers —
SURVEY §7.4 hard parts #1/#2: the 153 state machine must isolate trailing
junk, and the label/note builders must be deterministic pure functions of
the subfield sequence.
"""

from hypothesis import given, settings
from hypothesis import strategies as st

from kgx import marc
from kgx.marc import Datafield, Subfield

text_values = st.text(
    alphabet=st.characters(blacklist_categories=("Cs", "Cc")),
    min_size=1, max_size=12)


def df(subfields):
    return Datafield(tag="153", ind1=" ", ind2=" ",
                     subfields=[Subfield(code=c, value=v) for c, v in subfields])


class TestParse153Properties:
    @given(junk=st.lists(
        st.tuples(st.sampled_from(["i", "x", "t", "9"]), text_values),
        max_size=6))
    @settings(max_examples=100, deadline=None)
    def test_trailing_junk_never_leaks(self, junk):
        """Whatever follows $j, the notation/parent stay fixed
        (non-notation codes flip the machine to 'other' mode)."""
        base = [("a", "003.5"), ("e", "003"), ("j", "Caption")]
        t0 = marc.parse_153(df(base))
        t1 = marc.parse_153(df(base + junk))
        assert t1[1] == t0[1] == "003.5"      # notation
        assert t1[3] == t0[3] == "003"        # parent

    @given(caption=text_values)
    @settings(max_examples=50, deadline=None)
    def test_caption_passthrough(self, caption):
        _, notation, _, _, got = marc.parse_153(df([("a", "1"), ("j", caption)]))
        assert got == caption
        assert notation == "1"

    @given(table=st.from_regex(r"[0-9A-Z]{1,3}", fullmatch=True),
           a=st.from_regex(r"[0-9.]{1,8}", fullmatch=True))
    @settings(max_examples=50, deadline=None)
    def test_table_prefix(self, table, a):
        _, notation, _, _, _ = marc.parse_153(df([("z", table), ("a", a)]))
        assert notation == "%s--%s" % (table, a)


class TestStringifyProperties:
    @given(parts=st.lists(
        st.tuples(st.sampled_from(["a", "i", "t", "x"]), text_values),
        min_size=1, max_size=8))
    @settings(max_examples=100, deadline=None)
    def test_concat_structure(self, parts):
        """The result contains every subfield value in order, and the only
        inserted characters are single joining spaces."""
        d = Datafield(tag="680", ind1=" ", ind2=" ",
                      subfields=[Subfield(code=c, value=v) for c, v in parts])
        out = marc.stringify(d)
        pos = 0
        for _, v in parts:
            nxt = out.find(v, pos)
            assert nxt != -1, (out, v)
            pos = nxt + len(v)
        stripped = out
        for _, v in parts:
            stripped = stripped.replace(v, "", 1)
        assert set(stripped) <= {" "}

    @given(value=text_values)
    @settings(max_examples=50, deadline=None)
    def test_c_is_span_end(self, value):
        d = Datafield(tag="253", ind1=" ", ind2=" ",
                      subfields=[Subfield(code="a", value="420"),
                                 Subfield(code="c", value=value)])
        assert marc.stringify(d) == "420-" + value


class TestTermProperties:
    @given(labels=st.lists(text_values, min_size=2, max_size=5),
           caption_idx=st.integers(min_value=0, max_value=4))
    @settings(max_examples=50, deadline=None)
    def test_is_caption_always_first(self, labels, caption_idx):
        caption_idx = caption_idx % len(labels)
        fields = []
        for i, label in enumerate(labels):
            sfs = [Subfield(code="a", value=label)]
            if i == caption_idx:
                sfs.append(Subfield(code="9", value="ess=isCaption"))
            fields.append(Datafield(tag="750", ind1=" ", ind2="7", subfields=sfs))
        record = marc.MarcRecord(leader=None, controlfields={}, datafields=fields)
        terms = marc.get_terms(record, "7")
        assert terms[0].value == labels[caption_idx]
        # non-caption terms keep document order
        rest = [t.value for t in terms[1:]]
        expected = [l for i, l in enumerate(labels) if i != caption_idx]
        assert rest == expected


class TestComponentProperties:
    @given(n=st.integers(min_value=1, max_value=6))
    @settings(max_examples=30, deadline=None)
    def test_765_reverse_order_preserved(self, n):
        """k 765 fields, each with a distinct base → components come out in
        reverse document order, exactly one per field plus the base."""
        fields = []
        for i in range(n):
            fields.append(Datafield(tag="765", ind1="0", ind2=" ", subfields=[
                Subfield(code="b", value="B%d" % i),
                Subfield(code="r", value=""),
                Subfield(code="s", value="%d" % i),
            ]))
        record = marc.MarcRecord(leader=None, controlfields={}, datafields=fields)
        comps = marc.parse_765_components(record, None)
        # reversed: last field's base wins the single $b slot
        assert comps[0] == "B%d" % (n - 1)
        assert comps[1:] == ["%d" % i for i in reversed(range(n))]


class TestGreedyPackProperties:
    @given(tokens=st.lists(st.integers(min_value=1, max_value=400),
                           min_size=1, max_size=200),
           capacity=st.integers(min_value=1, max_value=300))
    @settings(max_examples=200, deadline=None)
    def test_greedy_pack_invariants(self, tokens, capacity):
        import numpy as np

        from kgx.traindata import greedy_pack

        n = np.array(tokens, dtype=np.int64)
        seq = greedy_pack(n, capacity)
        # sequence ids are contiguous, non-decreasing, start at 1
        assert seq[0] == 1
        assert ((np.diff(seq) == 0) | (np.diff(seq) == 1)).all()
        for s in range(1, seq.max() + 1):
            members = n[seq == s]
            # a multi-doc sequence fits the budget
            if len(members) > 1:
                assert members.sum() <= capacity
            # greedy: the next sequence's first doc would not have fit
            nxt = n[seq == s + 1]
            if len(nxt):
                assert members.sum() + nxt[0] > capacity


class TestJaccardEscalationProperties:
    @given(n_clusters=st.integers(min_value=1, max_value=25),
           cluster_size=st.integers(min_value=1, max_value=4),
           vocab_size=st.integers(min_value=25, max_value=60),
           seed=st.integers(min_value=0, max_value=10_000))
    @settings(max_examples=50, deadline=None)
    def test_escalated_equals_exact_on_separated_clusters(
            self, n_clusters, cluster_size, vocab_size, seed):
        """Clusters with within-J ≥ vocab/(vocab+2) ≈ 0.93 (LSH catch
        probability ≈ 1-1e-13 per pair — deterministically caught) and
        zero cross-cluster overlap: the escalated path must reproduce
        the exact answer."""
        from kgx.dedup import _block_pairs_escalated, _block_pairs_exact

        ids, sets = [], []
        doc = 0
        for c in range(n_clusters):
            vocab = {"s%d_c%d_w%d" % (seed, c, w) for w in range(vocab_size)}
            for m in range(cluster_size):
                ids.append(doc)
                sets.append(vocab | {"s%d_c%d_x%d" % (seed, c, m)})
                doc += 1
        threshold = 0.8
        exact = _block_pairs_exact(ids, sets, threshold)
        esc = _block_pairs_escalated(ids, sets, threshold)
        assert sorted(exact) == esc


class TestTkeyFormat2Properties:
    """Fuzz the compact sort key (canonicalize._add_tkey_arrow format 2):
    subject roundtrip through _dedup_sorted_block must be exact for
    every URI shape (A-case folded, B/C embedded), and the sorted tkey
    order must equal the reference 3-sorter rule (skey, subj, hash)."""

    @staticmethod
    def _mk_batch(subjects):
        import pyarrow as pa

        n = len(subjects)
        return pa.table({
            "subj": pa.array(subjects, pa.string()),
            "pred": pa.array(["http://p/%d" % (i % 3) for i in range(n)],
                             pa.string()),
            "obj": pa.array(["o%d" % i for i in range(n)], pa.string()),
            "obj_is_literal": pa.array([True] * n),
            "obj_lang": pa.array([None] * n, pa.string()),
            "obj_datatype": pa.array([None] * n, pa.string())})

    @given(st.lists(
        st.one_of(
            # A-case: arbitrary printable URIs
            st.text(alphabet=st.characters(min_codepoint=0x20,
                                           max_codepoint=0x7e),
                    min_size=1, max_size=40),
            # B-case: dewey-style class URIs
            st.from_regex(r"http://d\.x/class/[0-9]{1,3}\.[0-9]{1,3}/e23/",
                          fullmatch=True),
            # C-case: table--number URIs
            st.from_regex(r"http://d\.x/class/[0-9A-Z]{1,2}--[0-9]{1,4}/e2/",
                          fullmatch=True)),
        min_size=1, max_size=30, unique=True))
    @settings(max_examples=60, deadline=None)
    def test_subject_roundtrip_and_order(self, subjects):
        import re

        import pyarrow.compute as pc

        from kgx.canonicalize import (_add_tkey_arrow,
                                      _dedup_sorted_block)
        from kgx.materialize import sort_key

        keyed = _add_tkey_arrow(self._mk_batch(subjects))
        srt = keyed.take(pc.sort_indices(keyed.column("tkey")))
        out = _dedup_sorted_block(srt)
        # subject roundtrip: every input subject (with the separator
        # stripped, as _add_tkey_arrow documents) comes back exactly
        stripped = [s.replace("\x1f", "") for s in subjects]
        assert sorted(out.column("subj").to_pylist()) == sorted(stripped)
        # order law: tkey order == (reference sort key, subj) order
        got_subjs = out.column("subj").to_pylist()
        want = sorted(got_subjs, key=lambda s: (sort_key(s), s))
        # hash tiebreak only applies WITHIN one subject; across
        # subjects (unique here) the (skey, subj) order is total
        assert got_subjs == want


class TestSsjoinBandedFuzz:
    def test_banded_equals_brute_force_random_corpora(self, ray_session):
        """Randomized corpora through the banded rank path vs Python
        brute force — vocabulary sized to force multi-cell bands."""
        import random

        import pandas as pd
        import ray.data

        from kgx.dedup import _ssjoin_prefix_ds

        rng = random.Random(20260820)
        for trial in range(3):
            vocab = ["w%d" % i for i in range(rng.randint(50, 400))]
            docs = []
            for i in range(rng.randint(30, 80)):
                k = rng.randint(5, 25)
                toks = rng.sample(vocab, min(k, len(vocab)))
                docs.append((i, " ".join(toks)))
                if rng.random() < 0.5:  # planted near-dup
                    mut = list(toks)
                    if len(mut) >= 10:
                        mut[rng.randrange(len(mut))] = "x%d" % i
                    docs.append((1000 + i, " ".join(mut)))
            df = pd.DataFrame(docs, columns=["doc_id", "text"])
            got = _ssjoin_prefix_ds(
                ray.data.from_pandas(df), force_banded=True,
                cell_target=rng.choice([3, 16, 64])).to_pandas()
            sets = {int(i): set(t.split(" "))
                    for i, t in zip(df["doc_id"], df["text"])}
            ids = sorted(sets)
            want = {}
            for a_i, a in enumerate(ids):
                for b in ids[a_i + 1:]:
                    inter = len(sets[a] & sets[b])
                    union = len(sets[a]) + len(sets[b]) - inter
                    if 5 * inter >= 4 * union:
                        want[(a, b)] = ((1 << 20) * inter) // union
            got_d = {(int(r.doc_id_a), int(r.doc_id_b)): int(r.sim_q)
                     for r in got.itertuples()}
            assert got_d == want, "trial %d" % trial


class TestDamerauLe1Fuzz:
    @given(st.lists(st.text(alphabet="abcd", min_size=0, max_size=6),
                    min_size=2, max_size=8, unique=True))
    @settings(max_examples=50, deadline=None)
    def test_dl_le1_matches_duckdb(self, names):
        """The engine's single-operation DL<=1 check must agree with
        DuckDB's unrestricted damerau_levenshtein on every pair —
        including the variant-sensitive transposition shapes."""
        import duckdb

        from kgx.dedup import _dl_le1

        con = duckdb.connect()
        for i, a in enumerate(names):
            for b in names[i + 1:]:
                want = con.execute(
                    "SELECT damerau_levenshtein(?, ?) <= 1",
                    [a, b]).fetchone()[0]
                assert _dl_le1(a, b) == bool(want), (a, b)
