"""Property-based tests (hypothesis): structural invariants that
example-based tests under-cover — tree round-trips and pivot inverses
over arbitrary shapes."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as hst

from node_etl_spark.operators.tree import build_document, flatten_document

# random forests: each node a small id/label dict with optional children
node_st = hst.deferred(
    lambda: hst.fixed_dictionaries(
        {"id": hst.integers(0, 10**6), "label": hst.text(max_size=8)},
        optional={"children": hst.lists(node_st, max_size=3)},
    )
)


def _strip_empty_children(node):
    node = dict(node)
    kids = node.pop("children", None)
    if kids:
        node["children"] = [_strip_empty_children(k) for k in kids]
    return node


def _unique_ids(node, seen):
    if node["id"] in seen:
        return False
    seen.add(node["id"])
    return all(_unique_ids(k, seen) for k in node.get("children", []))


@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(doc=node_st)
def test_tree_flatten_build_roundtrip(spark, doc):
    doc = _strip_empty_children(doc)
    if not _unique_ids(doc, set()):
        return  # duplicate ids are out of contract (reference keys maps by id)
    flat = flatten_document(spark, doc, level_key=None, mpath_key=None)
    rows = [r.asDict() for r in flat.collect()]
    rebuilt = build_document(rows)
    assert _normalize(rebuilt) == _normalize(doc)


def _normalize(node):
    node = dict(node)
    kids = node.pop("children", None)
    out = {k: node[k] for k in sorted(node) if k != "parent"}
    if kids:
        out["children"] = sorted(
            (_normalize(k) for k in kids), key=lambda d: d["id"]
        )
    return out


from node_etl_spark.context import Context
from node_etl_spark.operators import Array2Map, Map2Array


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(entries=hst.dictionaries(
    hst.text(alphabet="abcdef", min_size=1, max_size=4),
    hst.integers(-10**6, 10**6),
    min_size=1, max_size=6,
))
def test_array2map_map2array_inverse(spark, entries):
    rows = [(1, [{"id": k, "n": v} for k, v in entries.items()])]
    df = spark.createDataFrame(
        rows, "row_id int, st array<struct<id:string,n:bigint>>"
    )
    ctx = Context()
    as_map = Array2Map(fields=["st"], id_key="id", value_field="n").apply(df, ctx)
    back = Map2Array(fields=["st"], id_key="id", value_key="n").apply(as_map, ctx)
    got = {e["id"]: e["n"] for e in back.collect()[0].st}
    assert got == entries
