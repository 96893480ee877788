from .base_source import PathSource
from .bucketed import read_bucketed, write_bucketed
from .paged import PagedRestSource, default_url_gen
from .layout import compact_parquet, zorder_write
from .tokenshards import (
    TokenShardSink,
    TokenShardSource,
    parse_token_shard,
    read_token_shards,
    write_token_shards,
)
from .snapshot import SnapshotSink, SnapshotSource, SnapshotTable
from .upsert import last_write_wins, upsert_parquet
from .readers import (
    BinarySource,
    CompressedNdjsonSource,
    CsvSource,
    FrameSource,
    JsonSource,
    NdjsonSource,
    OrcSource,
    ParquetSource,
    XmlSource,
    apply_root_node,
    folder_source,
)
from .writers import (
    CsvSink,
    HttpNdjsonSink,
    JsonArraySink,
    MongoSink,
    NdjsonSink,
    NoopSink,
    OrcSink,
    ParquetSink,
    XmlSink,
)

__all__ = [
    "PathSource", "ParquetSource", "OrcSource", "CsvSource", "JsonSource", "NdjsonSource", "CompressedNdjsonSource",
    "XmlSource", "FrameSource", "BinarySource", "folder_source", "apply_root_node",
    "PagedRestSource", "default_url_gen",
    "NdjsonSink", "ParquetSink", "OrcSink", "CsvSink", "XmlSink", "JsonArraySink", "NoopSink",
    "HttpNdjsonSink", "MongoSink",
    "write_bucketed", "read_bucketed",
    "upsert_parquet", "last_write_wins", "zorder_write", "compact_parquet",
    "TokenShardSink", "TokenShardSource", "write_token_shards",
    "read_token_shards", "parse_token_shard",
    "SnapshotTable", "SnapshotSource", "SnapshotSink",
]
