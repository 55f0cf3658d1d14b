"""Property tests: the Extended-JSON normalizer must turn ANY nested
document into json-friendly values (the reference contract — every BSON
value becomes str/int/float/bool/None/dict/list), and be idempotent on its
own output."""

from __future__ import annotations

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from pipelinewise_spark.sources.mongo import (
    class_to_string,
    serialize_document,
    transform_value,
)

_oid = st.from_regex(r"[0-9a-f]{24}", fullmatch=True).map(lambda s: {"$oid": s})
_num_long = st.integers(-(2**62), 2**62).map(
    lambda n: {"$numberLong": str(n)}
)
_num_int = st.integers(-(2**31), 2**31 - 1).map(
    lambda n: {"$numberInt": str(n)}
)
_decimal = st.decimals(allow_nan=False, allow_infinity=False).map(
    lambda d: {"$numberDecimal": str(d)}
)
_date_canon = st.integers(-(10**12), 10**13).map(
    lambda ms: {"$date": {"$numberLong": str(ms)}}
)
_ts = st.tuples(st.integers(0, 2**31 - 1), st.integers(0, 1000)).map(
    lambda t: {"$timestamp": {"t": t[0], "i": t[1]}}
)
_binary = st.binary(max_size=32).map(
    lambda b: {"$binary": {"base64": __import__("base64").b64encode(b).decode(),
                           "subType": "00"}}
)
_minmax = st.sampled_from([{"$minKey": 1}, {"$maxKey": 1}])

_scalar = st.one_of(
    st.none(), st.booleans(), st.integers(-(2**53), 2**53),
    st.floats(allow_nan=False, allow_infinity=False), st.text(max_size=20),
    _oid, _num_long, _num_int, _decimal, _date_canon, _ts, _binary, _minmax,
)

_value = st.recursive(
    _scalar,
    lambda children: st.one_of(
        st.lists(children, max_size=4),
        st.dictionaries(st.text(max_size=8), children, max_size=4),
    ),
    max_leaves=20,
)

_document = st.dictionaries(st.text(min_size=1, max_size=8), _value, max_size=6)


def _json_friendly(v) -> bool:
    if v is None or isinstance(v, (bool, int, float, str)):
        return True
    if isinstance(v, list):
        return all(_json_friendly(x) for x in v)
    if isinstance(v, dict):
        return all(isinstance(k, str) and _json_friendly(x) for k, x in v.items())
    return False


@settings(max_examples=200, deadline=None)
@given(_document)
def test_serialize_document_always_json_friendly(doc):
    out = serialize_document(doc)
    assert _json_friendly(out)
    json.dumps(out)  # round-trips through the transport encoding


@settings(max_examples=200, deadline=None)
@given(_value)
def test_transform_value_idempotent_unless_wrapper(v):
    once = transform_value(v)
    assert _json_friendly(once)
    # plain (non-$-wrapped) output must be a fixed point of the transform —
    # except strings that themselves parse as wrapper dicts can't occur
    # because transform_value's outputs are scalars/containers, never new
    # $-keyed dicts
    twice = transform_value(once)
    if not _contains_dollar_key(once):
        assert twice == once


def _contains_dollar_key(v) -> bool:
    if isinstance(v, dict):
        return any(k.startswith("$") for k in v) or any(
            _contains_dollar_key(x) for x in v.values()
        )
    if isinstance(v, list):
        return any(_contains_dollar_key(x) for x in v)
    return False


@settings(max_examples=100, deadline=None)
@given(st.one_of(_oid, _date_canon, _ts, _binary,
                 st.text(max_size=20), st.integers(-(2**53), 2**53)))
def test_class_to_string_total_on_supported_ids(raw):
    s = class_to_string(raw)
    assert isinstance(s, str)
