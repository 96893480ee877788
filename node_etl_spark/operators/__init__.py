"""Operator registry (reference index.js:2-47).

Every reference operator re-expressed Spark-first, plus net-new
relational ops (semi/anti joins, route tagging) the reference lacked.
"""

from .base import FnTransform, Op, Sink, Source, Transform
from .joins import (
    AntiJoin,
    AsofJoin,
    JoinDetail,
    Joiner,
    RangeJoin,
    SemiJoin,
    Vocab,
    salted_join,
)
from .rowops import (
    Array2Map,
    Filter,
    Map2Array,
    Mapper,
    Nothing,
    Reducer,
    Sorter,
    Thru,
    Uniquer,
)
from .observe import Limit, Spy, pipeline_dag
from .splitter import RouteTag, Splitter
from .tree import (
    TreeFlatten,
    build_document,
    build_json_column,
    flatten_document,
    resolve_hierarchy,
)

__all__ = [
    "Op", "Source", "Transform", "Sink", "FnTransform",
    "Filter", "Mapper", "Thru", "Sorter", "Reducer", "Uniquer",
    "Array2Map", "Map2Array", "Nothing",
    "Joiner", "Vocab", "JoinDetail", "SemiJoin", "AntiJoin",
    "AsofJoin", "RangeJoin", "salted_join",
    "Splitter", "RouteTag", "Spy", "Limit", "pipeline_dag",
    "TreeFlatten", "flatten_document", "resolve_hierarchy",
    "build_document", "build_json_column",
]
