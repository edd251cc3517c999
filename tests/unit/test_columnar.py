"""Columnar metadata index: vectorized filter masks must agree EXACTLY with
MetadataFilter.matches row-by-row semantics (the reference's evaluation,
src/core/metadata_filter.rs). Randomized property test + targeted cases."""
import numpy as np
import pytest

from fabstir_vectordb_tpu.core.columnar import ColumnarMetadata
from fabstir_vectordb_tpu.core.metadata_filter import MetadataFilter


def build(rows):
    t = ColumnarMetadata(capacity=max(len(rows), 1))
    for r, meta in enumerate(rows):
        t.set_row(r, meta)
    return t


def check_equiv(rows, filter_json):
    flt = MetadataFilter.from_json(filter_json)
    t = build(rows)
    got = t.mask(flt, len(rows))
    assert got is not None, f"filter unexpectedly non-lowerable: {filter_json}"
    want = flt.compile_mask(rows)
    np.testing.assert_array_equal(got, want, err_msg=str(filter_json))


ROWS = [
    {"cat": "a", "n": 1, "flag": True, "tags": ["x", "y"], "deep": {"v": 5}},
    {"cat": "b", "n": 2.5, "flag": False, "tags": ["y"], "deep": {"v": 7}},
    {"cat": "a", "n": 3, "tags": [], "nil": None},
    {"cat": "c", "n": True},          # bool is NOT a number
    {"n": "5"},                        # string is NOT a number
    None,                              # no metadata: never matches
    {},                                # empty dict
    {"tags": "x"},                     # scalar where others have arrays
    {"tags": [1, 2, True, None]},
    {"deep": {"v": "s"}, "cat": "b"},
]


class TestEquivalence:
    @pytest.mark.parametrize("f", [
        {"cat": "a"},
        {"cat": "z"},
        {"n": 1},
        {"n": 1.0},
        {"n": 2.5},
        {"n": True},                   # bool equality, not numeric
        {"flag": True},
        {"flag": False},
        {"nil": None},
        {"tags": "x"},                 # array-contains OR scalar equality
        {"tags": "y"},
        {"tags": 2},
        {"tags": True},
        {"tags": None},
        {"deep.v": 5},
        {"deep.v": "s"},
        {"missing": 1},
        {"n": {"$gte": 1, "$lte": 3}},
        {"n": {"$gt": 1}},
        {"n": {"$lt": 2.5}},
        {"n": {"$gte": 2.5}},
        {"deep.v": {"$gt": 5}},
        {"cat": {"$in": ["a", "b"]}},
        {"cat": {"$in": []}},
        {"n": {"$in": [1, 3]}},
        {"tags": {"$in": ["x"]}},      # $in does NOT do array-contains
        {"$and": [{"cat": "a"}, {"n": {"$gte": 2}}]},
        {"$or": [{"cat": "c"}, {"tags": "y"}]},
        {"$and": []},                  # matches every non-None row
        {"$or": []},                   # matches nothing
        {"cat": "a", "n": 1},          # implicit AND
        {"$or": [{"$and": [{"cat": "a"}, {"flag": True}]}, {"nil": None}]},
    ])
    def test_targeted(self, f):
        check_equiv(ROWS, f)

    def test_randomized_property(self):
        rng = np.random.default_rng(7)
        cats = ["a", "b", "c", None]
        rows = []
        for i in range(500):
            r = rng.random()
            if r < 0.05:
                rows.append(None)
                continue
            meta = {}
            if rng.random() < 0.9:
                meta["cat"] = cats[rng.integers(len(cats))]
            if rng.random() < 0.8:
                meta["n"] = float(rng.integers(0, 20)) if rng.random() < 0.5 \
                    else bool(rng.random() < 0.5)
            if rng.random() < 0.6:
                meta["tags"] = [
                    ["x", "y", "z", 1, 2, None][rng.integers(6)]
                    for _ in range(rng.integers(0, 4))
                ]
            if rng.random() < 0.4:
                meta["deep"] = {"v": int(rng.integers(0, 10))}
            rows.append(meta)
        filters = [
            {"cat": "a"},
            {"cat": None},
            {"n": 5},
            {"n": True},
            {"n": {"$gte": 3, "$lt": 12}},
            {"tags": "y"},
            {"tags": 1},
            {"tags": None},
            {"deep.v": {"$gt": 4}},
            {"cat": {"$in": ["a", "c"]}},
            {"$and": [{"cat": "b"}, {"n": {"$lte": 10}}]},
            {"$or": [{"tags": "z"}, {"deep.v": 9}]},
            {"cat": "a", "tags": "x"},
        ]
        for f in filters:
            check_equiv(rows, f)


class TestFallbacks:
    def test_container_equality_not_lowerable(self):
        t = build([{"a": {"x": 1}}, {"a": [1, 2]}])
        assert t.mask(MetadataFilter.from_json({"a": {"x": 1}}), 2) is None
        assert t.mask(MetadataFilter.from_json({"a": {"$in": [[1, 2]]}}), 2) is None

    def test_untracked_field_cap(self):
        t = ColumnarMetadata(capacity=4, max_fields=2)
        t.set_row(0, {"a": 1, "b": 2, "c": 3})
        assert "c" in t.untracked
        assert t.mask(MetadataFilter.from_json({"c": 3}), 1) is None
        # tracked fields still lower fine
        m = t.mask(MetadataFilter.from_json({"a": 1}), 1)
        assert m is not None and m[0]

    def test_never_seen_field_is_all_false(self):
        t = build([{"a": 1}, {"a": 2}])
        m = t.mask(MetadataFilter.from_json({"ghost": 1}), 2)
        assert m is not None and not m.any()


class TestMutation:
    def test_update_and_clear(self):
        t = ColumnarMetadata()
        t.set_row(0, {"cat": "a", "tags": ["x"]})
        f = MetadataFilter.from_json({"tags": "x"})
        assert t.mask(f, 1)[0]
        t.set_row(0, {"cat": "a", "tags": ["y"]})
        assert not t.mask(f, 1)[0]
        t.clear_row(0)
        assert not t.mask(MetadataFilter.from_json({"cat": "a"}), 1)[0]

    def test_epoch_bumps_on_mutation(self):
        t = ColumnarMetadata()
        e0 = t.epoch
        t.set_row(0, {"a": 1})
        assert t.epoch > e0
        e1 = t.epoch
        t.clear_row(0)
        assert t.epoch > e1

    def test_capacity_growth_preserves_values(self):
        t = ColumnarMetadata(capacity=2)
        t.set_row(0, {"n": 7, "s": "x", "b": True, "tags": ["q"], "z": None})
        t.set_row(5000, {"n": 8})
        for f, row, want in [
            ({"n": 7}, 0, True), ({"s": "x"}, 0, True), ({"b": True}, 0, True),
            ({"tags": "q"}, 0, True), ({"z": None}, 0, True),
            ({"n": 8}, 5000, True), ({"n": 7}, 5000, False),
        ]:
            m = t.mask(MetadataFilter.from_json(f), 5001)
            assert bool(m[row]) == want, (f, row)


class TestScale:
    def test_mask_at_200k_is_fast_and_exact(self):
        import time

        n = 200_000
        rng = np.random.default_rng(0)
        cats = np.array(["a", "b", "c", "d"])[rng.integers(0, 4, n)]
        nums = rng.integers(0, 100, n)
        t = ColumnarMetadata(capacity=n)
        for r in range(n):
            t.set_row(r, {"cat": str(cats[r]), "n": int(nums[r])})
        flt = MetadataFilter.from_json(
            {"$and": [{"cat": "b"}, {"n": {"$gte": 10, "$lt": 60}}]}
        )
        t0 = time.perf_counter()
        m = t.mask(flt, n)
        dt = time.perf_counter() - t0
        want = (cats == "b") & (nums >= 10) & (nums < 60)
        np.testing.assert_array_equal(m, want)
        assert dt < 0.05, f"mask took {dt*1e3:.1f}ms at 200K rows"


def test_randomized_filters_and_rows_fuzz():
    """Full property fuzz: BOTH the metadata rows and the filter trees are
    random; the columnar bitmask must agree with MetadataFilter.matches on
    every row for every generated filter (500 filters x 300 rows)."""
    rng = np.random.default_rng(41)
    values = ["a", "b", "c", 0, 1, 2.5, True, False, None]
    fields = ["cat", "n", "flag", "tags", "deep.v", "ghost"]

    def rand_rows(n=300):
        rows = []
        for _ in range(n):
            if rng.random() < 0.06:
                rows.append(None)
                continue
            meta = {}
            if rng.random() < 0.8:
                meta["cat"] = values[rng.integers(0, len(values))]
            if rng.random() < 0.8:
                meta["n"] = values[rng.integers(0, len(values))]
            if rng.random() < 0.5:
                meta["flag"] = bool(rng.integers(0, 2))
            if rng.random() < 0.6:
                meta["tags"] = [values[rng.integers(0, len(values))]
                                for _ in range(rng.integers(0, 4))]
            if rng.random() < 0.5:
                meta["deep"] = {"v": values[rng.integers(0, len(values))]}
            rows.append(meta)
        return rows

    def rand_leaf():
        field = fields[rng.integers(0, len(fields))]
        r = rng.random()
        if r < 0.45:
            return {field: values[rng.integers(0, len(values))]}
        if r < 0.65:
            ops = {}
            for op in ("$gte", "$gt", "$lte", "$lt"):
                if rng.random() < 0.4:
                    ops[op] = float(rng.integers(-2, 5))
            if "$gte" in ops and "$gt" in ops:
                del ops["$gt"]  # combination is an error by spec
            if "$lte" in ops and "$lt" in ops:
                del ops["$lt"]
            if not ops:
                ops["$gte"] = 0.0
            return {field: ops}
        k = int(rng.integers(0, 4))
        return {field: {"$in": [values[rng.integers(0, len(values))]
                                for _ in range(k)]}}

    def rand_filter(depth=0):
        r = rng.random()
        if depth < 2 and r < 0.25:
            return {"$and": [rand_filter(depth + 1)
                             for _ in range(rng.integers(0, 3))]}
        if depth < 2 and r < 0.5:
            return {"$or": [rand_filter(depth + 1)
                            for _ in range(rng.integers(0, 3))]}
        leaf = rand_leaf()
        if rng.random() < 0.3:  # implicit AND of two leaves
            leaf.update({k: v for k, v in rand_leaf().items()
                         if k not in leaf})
        return leaf

    rows = rand_rows()
    for _ in range(500):
        check_equiv(rows, rand_filter())
