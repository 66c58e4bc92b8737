"""Hypothesis property tests for the pure-Python engine pieces (no
SparkSession — fast): CubeSpec JSON round-trip over generated specs,
and router candidate logic monotonicity."""

from __future__ import annotations

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from mongo_olap_spark.cube.spec import CubeSpec, Dimension, Measure, _GRANULARITIES

idents = st.text(alphabet=string.ascii_lowercase + "_", min_size=1, max_size=12).filter(
    lambda s: not s.startswith("_")
)


@st.composite
def specs(draw):
    n_dims = draw(st.integers(0, 4))
    n_meas = draw(st.integers(1, 5))
    names = draw(
        st.lists(idents, min_size=n_dims + n_meas, max_size=n_dims + n_meas, unique=True)
    )
    dims = tuple(
        Dimension(
            name=names[i],
            path=draw(st.one_of(st.none(), idents)),
            granularity=draw(st.one_of(st.none(), st.sampled_from(_GRANULARITIES))),
        )
        for i in range(n_dims)
    )
    measures = tuple(
        Measure(
            name=names[n_dims + i],
            op=draw(st.sampled_from(["count", "sum", "avg", "min", "max"])),
            path=draw(idents),
        )
        for i in range(n_meas)
    )
    return CubeSpec(
        name=draw(idents),
        source=draw(idents),
        dimensions=dims,
        measures=measures,
        filter_sql=draw(st.one_of(st.none(), st.just("x > 1"))),
    )


@given(specs())
@settings(max_examples=200, deadline=None)
def test_spec_json_roundtrip(spec):
    assert CubeSpec.from_json(spec.to_json()) == spec


@given(specs())
@settings(max_examples=200, deadline=None)
def test_storage_cols_unique_and_typed(spec):
    cols = [c for m in spec.measures for c in m.storage_cols()]
    assert len(cols) == len(set(cols))
    for c in cols:
        assert c.rsplit("_", 1)[1] in {"sum", "cnt", "min", "max"}


@given(specs())
@settings(max_examples=200, deadline=None)
def test_delete_safe_iff_no_minmax(spec):
    assert spec.delete_safe == all(m.op not in ("min", "max") for m in spec.measures)
