"""Semantics tests for the round-4 continuation operators: exact-substring
run detection, weighted sampling, token-budget fill, and PageRank.

Each test plants a KNOWN structure and asserts the operator recovers it
exactly — complementing the plan audits (shape) and the DuckDB gates
(engine agreement on fixture data) with constructed-case correctness.
"""

from __future__ import annotations

import math

import pytest

from aws_insurancelake_etl_spark.operators.dedup import substring_run_pairs
from aws_insurancelake_etl_spark.operators.graph import pagerank
from aws_insurancelake_etl_spark.operators.textanalysis import (
    token_budget_fill,
    weighted_sample_topk,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


class TestSubstringRuns:
    def test_planted_run_recovered_exactly(self, spark):
        """Two docs share exactly one 10-token run; everything else is
        disjoint vocabulary, so the reported max run must be exactly 10."""
        shared = " ".join(f"s{i}" for i in range(10))
        df = _docs(spark, [
            (1, f"a1 a2 a3 {shared} a4 a5"),
            (2, f"b1 b2 {shared} b3 b4 b5 b6"),
        ])
        out = substring_run_pairs(df, k=4, min_run_tokens=8).collect()
        assert len(out) == 1
        row = out[0]
        assert (row.doc_a, row.doc_b, row.max_run_tokens) == (1, 2, 10)

    def test_below_threshold_pair_excluded(self, spark):
        shared = " ".join(f"s{i}" for i in range(6))  # 6 < 8
        df = _docs(spark, [
            (1, f"a1 a2 a3 a4 {shared}"),
            (2, f"{shared} b1 b2 b3 b4"),
        ])
        assert substring_run_pairs(df, k=4, min_run_tokens=8).count() == 0

    def test_two_separate_runs_report_longest(self, spark):
        """Two shared runs on different diagonals — the per-pair result is
        the LONGEST, and a gap splits islands (no bridging)."""
        r1 = " ".join(f"x{i}" for i in range(8))
        r2 = " ".join(f"y{i}" for i in range(12))
        df = _docs(spark, [
            (1, f"{r1} a1 a2 a3 {r2}"),
            (2, f"{r2} b1 b2 {r1}"),
        ])
        out = substring_run_pairs(df, k=4, min_run_tokens=8).collect()
        assert len(out) == 1
        assert out[0].max_run_tokens == 12

    def test_stop_gram_cap_only_underreports(self, spark):
        """With a posting cap that drops the run's grams, the pair either
        disappears or reports a SHORTER run — never a longer one."""
        shared = " ".join(f"s{i}" for i in range(10))
        rows = [(i, f"pad{i}a pad{i}b {shared}") for i in range(1, 6)]
        df = _docs(spark, rows)
        full = {
            (r.doc_a, r.doc_b): r.max_run_tokens
            for r in substring_run_pairs(df, k=4, min_run_tokens=4).collect()
        }
        capped = {
            (r.doc_a, r.doc_b): r.max_run_tokens
            for r in substring_run_pairs(
                df, k=4, min_run_tokens=4, max_posting_len=3
            ).collect()
        }
        for pair, run in capped.items():
            assert run <= full[pair]


class TestWeightedSample:
    def test_exact_k_per_stratum_and_deterministic(self, spark):
        rows = [(f"s{j}", i * 10 + j, (i % 7) + 1) for i in range(40) for j in range(3)]
        df = spark.createDataFrame(rows, ["lang", "doc_id", "w"])
        a = weighted_sample_topk(df, "w", k=5, strata_col="lang")
        b = weighted_sample_topk(df, "w", k=5, strata_col="lang")
        ra = sorted((r.lang, r.doc_id, r.rk) for r in a.collect())
        rb = sorted((r.lang, r.doc_id, r.rk) for r in b.collect())
        assert ra == rb
        per = {}
        for lang, _, _ in ra:
            per[lang] = per.get(lang, 0) + 1
        assert per == {"s0": 5, "s1": 5, "s2": 5}

    def test_matches_brute_force_keys(self, spark):
        """The selected rows must be exactly the k largest ln(u)/w keys,
        replayed here with Python's md5 — independent of Spark's."""
        import hashlib

        rows = [("x", i, i + 1) for i in range(30)]
        df = spark.createDataFrame(rows, ["lang", "doc_id", "w"])
        got = sorted(
            r.doc_id
            for r in weighted_sample_topk(df, "w", k=7, strata_col="lang").collect()
        )

        def key(doc_id, w):
            h = hashlib.md5(f"wsample:{doc_id}".encode()).hexdigest()[:8]
            u = (int(h, 16) + 1) / 4294967297.0
            return math.log(u) / w

        expect = sorted(
            sorted(rows, key=lambda r: (-key(r[1], r[2]), r[1]))[:7],
        )
        assert got == sorted(r[1] for r in expect)


class TestTokenBudgetFill:
    def test_budget_invariants(self, spark):
        rows = [
            ("a", i, " ".join(f"t{j}" for j in range(10 + i)))
            for i in range(8)
        ] + [("b", 100, "u1 u2 u3")]
        df = spark.createDataFrame(rows, ["source", "doc_id", "text"])
        df = df.withColumn("q", df.doc_id * 1.0)  # order: highest doc_id first
        out = token_budget_fill(df, budget=30, order_col="q").collect()
        kept = {r.doc_id: r for r in out}
        # every kept row started under budget
        assert all(r.cum_before < 30 for r in out)
        # stratum b is tiny: fully kept
        assert 100 in kept
        # stratum a: walking doc_id desc (17,16,15... tokens), 30-token
        # budget admits doc 7 (17 toks, cum 0) and doc 6 (16 toks, cum 17);
        # doc 5 sees cum 33 >= 30.
        a_kept = sorted(r.doc_id for r in out if r.stratum == "a")
        assert a_kept == [6, 7]


class TestPageRank:
    def _edges(self, spark, rows):
        return spark.createDataFrame(rows, ["src", "dst", "weight"])

    def _nodes(self, spark, ids):
        return spark.createDataFrame([(i,) for i in ids], ["node"])

    def test_mass_conserved_and_symmetric_cycle_uniform(self, spark):
        """A symmetric cycle must stay exactly uniform, and total rank
        mass must be 1 after any number of rounds."""
        n = 4
        edges = self._edges(
            spark, [(i, (i + 1) % n, 1.0) for i in range(n)]
        )
        ranks = {r.node: r.rank for r in
                 pagerank(edges, self._nodes(spark, range(n)), iterations=3).collect()}
        assert abs(sum(ranks.values()) - 1.0) < 1e-9
        for v in ranks.values():
            assert abs(v - 0.25) < 1e-12

    def test_dangling_mass_redistributed(self, spark):
        """Node 2 has no out-edges; without redistribution, mass leaks
        and the total drops below 1."""
        edges = self._edges(spark, [(0, 2, 1.0), (1, 2, 1.0)])
        ranks = {r.node: r.rank for r in
                 pagerank(edges, self._nodes(spark, range(3)), iterations=4).collect()}
        assert abs(sum(ranks.values()) - 1.0) < 1e-9
        assert ranks[2] > ranks[0]

    def test_weighted_edges_shift_rank(self, spark):
        """0 sends 90% of its walk to 1 and 10% to 2 — node 1 must
        outrank node 2."""
        edges = self._edges(
            spark,
            [(0, 1, 9.0), (0, 2, 1.0), (1, 0, 1.0), (2, 0, 1.0)],
        )
        ranks = {r.node: r.rank for r in
                 pagerank(edges, self._nodes(spark, range(3)), iterations=6).collect()}
        assert ranks[1] > ranks[2]
        assert abs(sum(ranks.values()) - 1.0) < 1e-9


class TestPCA:
    def test_gram_symmetric_and_pc1_matches_numpy(self, spark):
        import numpy as np

        from aws_insurancelake_etl_spark.operators.similarity import (
            gram_matrix,
            pc1_power_iteration,
        )

        rng = np.random.RandomState(7)
        X = rng.randn(40, 6).astype(np.float32)
        df = spark.createDataFrame(
            [(i, [float(x) for x in X[i]]) for i in range(40)],
            ["vec_id", "embedding"],
        )
        g = {(r.i, r.j): float(r.gram_dec) for r in gram_matrix(df).collect()}
        for i in range(1, 7):
            for j in range(1, 7):
                assert g[(i, j)] == g[(j, i)]
        # driver-side iterations are O(dims^2) each — 300 rounds converge
        # even when the top two eigenvalues are close
        v = np.array(pc1_power_iteration(df, iterations=300))
        # numpy reference: leading eigenvector of the rounded-gram matrix
        G = np.array([[g[(i + 1, j + 1)] for j in range(6)] for i in range(6)])
        w, vecs = np.linalg.eigh(G)
        ref = vecs[:, np.argmax(w)]
        if ref[np.argmax(np.abs(ref))] < 0:
            ref = -ref
        assert np.allclose(v, ref, atol=1e-6)


class TestDateShift:
    def test_intervals_preserved_and_entities_differ(self, spark):
        from datetime import datetime

        from aws_insurancelake_etl_spark.operators.dataprotection import date_shift

        rows = [
            (1, 10, datetime(2024, 1, 1, 8, 0, 0)),
            (2, 10, datetime(2024, 1, 3, 8, 0, 0)),
            (3, 20, datetime(2024, 1, 1, 8, 0, 0)),
        ]
        df = spark.createDataFrame(rows, ["event_id", "user_id", "ts"])
        out = {r.event_id: r.ts for r in
               date_shift(df, ["ts"], "user_id").collect()}
        # intra-user interval exactly preserved
        assert (out[2] - out[1]).total_seconds() == 2 * 86400
        # different entities get different offsets (md5 spread)
        assert out[1] != out[3]
        # deterministic
        out2 = {r.event_id: r.ts for r in
                date_shift(df, ["ts"], "user_id").collect()}
        assert out == out2


class TestMixEpochs:
    def test_output_rows_equal_budget_and_repeats_bounded(self, spark):
        from aws_insurancelake_etl_spark.operators.textanalysis import mix_epochs

        rows = [("en", i) for i in range(40)] + [("de", 100 + i) for i in range(10)]
        df = spark.createDataFrame(rows, ["lang", "doc_id"])
        out = mix_epochs(
            df, weights_permille={"en": 600, "de": 400}, budget_docs=100
        ).collect()
        # exact budget split: en 60 rows, de 40 rows
        per = {}
        for r in out:
            per[r.lang] = per.get(r.lang, 0) + 1
        assert per == {"en": 60, "de": 40}
        # repetition spread is tight: epochs differ by at most 1 per stratum
        by_doc = {}
        for r in out:
            by_doc.setdefault((r.lang, r.doc_id), []).append(r.epoch)
        for (lang, _), epochs in by_doc.items():
            n = len(epochs)
            assert sorted(epochs) == list(range(1, n + 1))
        en_counts = sorted(len(v) for k, v in by_doc.items() if k[0] == "en")
        de_counts = sorted(len(v) for k, v in by_doc.items() if k[0] == "de")
        # en: 60 draws over 40 docs = 1 full epoch + 20 partial; de: 40 over
        # 10 = 4 full epochs exactly
        assert en_counts[0] == 1 and en_counts[-1] == 2 and sum(en_counts) == 60
        assert de_counts == [4] * 10


class TestChangeFeedInverse:
    def test_feed_of_applied_history_reflects_the_update(self, spark):
        """scd2_apply then change_feed: the derived events must narrate
        exactly what the apply did — inserts for the initial load, an
        update for the changed key carrying old AND new values, and no
        events for untouched keys beyond their insert."""
        from datetime import date

        from aws_insurancelake_etl_spark.operators.scd import (
            change_feed,
            scd2_apply,
        )

        current = spark.createDataFrame(
            [(1, "a", date(2024, 1, 1), None), (2, "b", date(2024, 1, 1), None)],
            "k long, attr string, valid_from date, valid_to date",
        )
        updates = spark.createDataFrame(
            [(1, "a2", date(2024, 3, 1)), (3, "c", date(2024, 3, 1))],
            ["k", "attr", "effective_date"],
        )
        history = scd2_apply(current, updates, ["k"], ["attr"],
                             valid_from="valid_from", valid_to="valid_to")
        feed = change_feed(history, ["k"], ["attr"]).collect()
        events = {(r.k, r.change_type): r for r in feed}
        assert set(events) == {
            (1, "insert"), (1, "update"), (2, "insert"), (3, "insert"),
        }
        upd = events[(1, "update")]
        assert (upd.old_attr, upd.new_attr) == ("a", "a2")
        assert str(upd.changed_at) == "2024-03-01"
        assert events[(3, "insert")].new_attr == "c"


class TestSimhashPairs:
    def test_matches_python_replica(self, spark):
        """The full chain (token hash -> bit votes -> chunk blocking ->
        hamming verify) replicated in pure Python must produce the same
        pair set — including pairs AND non-pairs near the threshold."""
        import hashlib
        from itertools import combinations

        from aws_insurancelake_etl_spark.operators.dedup import (
            simhash_hamming_pairs,
        )

        docs = {
            1: "alpha beta gamma delta",
            2: "alpha beta gamma delta",          # identical -> hamming 0
            3: "alpha beta gamma epsilon",        # near
            4: "zeta eta theta iota kappa",       # far
            5: "zeta eta theta iota",             # near 4
        }
        df = spark.createDataFrame(list(docs.items()), ["doc_id", "text"])

        def sh(text, bits=16):
            toks = sorted(set(text.split()))
            votes = [0] * bits
            for t in toks:
                h = int(hashlib.md5(t.encode()).hexdigest()[:8], 16)
                for b in range(bits):
                    votes[b] += 1 if (h >> b) & 1 else -1
            return sum((1 << b) for b in range(bits) if votes[b] > 0)

        hashes = {k: sh(v) for k, v in docs.items()}

        def chunks(h):
            return [(i, (h >> (i * 4)) & 15) for i in range(4)]

        expect = set()
        for a, b in combinations(sorted(docs), 2):
            share = set(chunks(hashes[a])) & set(chunks(hashes[b]))
            ham = bin(hashes[a] ^ hashes[b]).count("1")
            if share and ham <= 3:
                expect.add((a, b, ham))
        got = {
            (r.doc_a, r.doc_b, r.hamming)
            for r in simhash_hamming_pairs(df).collect()
        }
        assert got == expect
        assert (1, 2, 0) in got  # identical docs found at hamming 0

    def test_parameter_validation(self, spark):
        """Pigeonhole completeness and bit-width limits are enforced:
        max_hamming >= chunks or chunks not dividing bits silently lose
        recall, and > 62 bits overflows a signed 64-bit simhash."""
        import pytest

        from aws_insurancelake_etl_spark.operators.dedup import (
            simhash_hamming_pairs,
        )

        df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
        with pytest.raises(ValueError, match="max_hamming"):
            simhash_hamming_pairs(df, bits=16, chunks=4, max_hamming=4)
        with pytest.raises(ValueError, match="divide bits"):
            simhash_hamming_pairs(df, bits=16, chunks=5, max_hamming=3)
        with pytest.raises(ValueError, match="64-bit"):
            simhash_hamming_pairs(df, bits=64, chunks=8, max_hamming=3)

    def test_wide_hash_chunk_extraction_is_bitexact(self, spark):
        """48-bit simhashes exercise the shiftright/mask chunk path where
        the old double-division extraction starts losing bits."""
        from aws_insurancelake_etl_spark.operators.dedup import (
            simhash_hamming_pairs,
        )

        df = spark.createDataFrame(
            [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta"),
             (3, "completely different words here entirely")],
            ["doc_id", "text"],
        )
        got = {
            (r.doc_a, r.doc_b, r.hamming)
            for r in simhash_hamming_pairs(
                df, bits=48, chunks=6, max_hamming=2
            ).collect()
        }
        assert (1, 2, 0) in got
        assert all(h <= 2 for _, _, h in got)


class TestPrivacyAndClassifier:
    def test_k_anonymity_empty_when_all_groups_large(self, spark):
        from aws_insurancelake_etl_spark.operators.dataprotection import (
            k_anonymity_audit,
        )

        rows = [(i % 2, "x", i) for i in range(20)]
        df = spark.createDataFrame(rows, ["nat", "seg", "id"])
        assert k_anonymity_audit(df, ["nat", "seg"], k=5).count() == 0
        risky = k_anonymity_audit(df, ["nat", "seg"], k=11).collect()
        assert {(r.nat, r.seg, r.class_size) for r in risky} == {
            (0, "x", 10), (1, "x", 10),
        }

    def test_classifier_score_matches_hand_computation(self, spark):
        import hashlib
        import math

        from aws_insurancelake_etl_spark.operators.textanalysis import (
            linear_text_classifier,
        )

        weights = [round(0.01 * i - 0.15, 6) for i in range(32)]
        df = spark.createDataFrame([(1, "alpha beta alpha")], ["doc_id", "text"])
        out = linear_text_classifier(df, weights).collect()[0]

        def bucket(t):
            return int(hashlib.md5(f"feat:{t}".encode()).hexdigest()[:8], 16) % 32

        s = sum(weights[bucket(t)] for t in ["alpha", "beta", "alpha"]) / 3
        expect = 1.0 / (1.0 + math.exp(-s))
        assert abs(out.score - round(expect, 6)) < 1e-9
        assert out.keep == (expect >= 0.5)


class TestHarnessSensitivity:
    """The differential comparator must actually bite: row drops, value
    drift, column renames, and row duplication all have to FAIL."""

    def _cmp(self):
        import importlib.util, os
        spec = importlib.util.spec_from_file_location(
            "check_oracle",
            os.path.join(os.path.dirname(os.path.dirname(__file__)),
                         "tools", "check_oracle.py"),
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod.compare

    def test_comparator_catches_mutations(self):
        import pandas as pd

        compare = self._cmp()
        base = pd.DataFrame({"k": [1, 2, 3], "v": [1.5, 2.5, 3.5]})
        ok, _ = compare(base.copy(), base.copy())
        assert ok == "OK"
        st, _ = compare(base.iloc[:2].copy(), base.copy())      # dropped row
        assert st == "FAIL"
        drift = base.copy(); drift.loc[1, "v"] = 2.5000001      # value drift
        assert compare(drift, base.copy())[0] == "FAIL"
        renamed = base.rename(columns={"v": "value"})           # column name
        assert compare(renamed, base.copy())[0] == "FAIL"
        dup = pd.concat([base, base.iloc[[0]]], ignore_index=True)
        assert compare(dup, pd.concat([base, base.iloc[[1]]],
                                      ignore_index=True))[0] == "FAIL"

    def test_comparator_order_independent(self):
        import pandas as pd

        compare = self._cmp()
        base = pd.DataFrame({"k": [1, 2, 3], "v": [1.5, 2.5, 3.5]})
        shuffled = base.iloc[[2, 0, 1]].reset_index(drop=True)
        st, _ = compare(shuffled, base)
        assert st == "OK"  # row order must NOT matter
        cols = base[["v", "k"]]
        assert compare(cols, base)[0] == "OK"  # column order must NOT matter


class TestObservedAudit:
    def test_observed_metrics_equal_explicit_pass(self, spark, tmp_path):
        from aws_insurancelake_etl_spark.plans.lineage import LineageLog

        df = spark.createDataFrame(
            [(1, 10.5, "a"), (2, 20.25, "b"), (3, -5.0, "c")],
            "id long, amount double, tag string",
        )
        log = LineageLog(execution_id="t", dataset="d")
        explicit = log.numeric_audit(df)

        log2 = LineageLog(execution_id="t2", dataset="d")
        instrumented, finish = log2.numeric_audit_observed(df)
        # any action over the instrumented frame populates the metrics
        instrumented.write.format("noop").mode("overwrite").save()
        observed = finish()

        assert observed["row_count"] == explicit["row_count"] == 3
        assert observed["column_sums"] == explicit["column_sums"]
        assert any(e["operation"] == "numericaudit" for e in log2.events)
