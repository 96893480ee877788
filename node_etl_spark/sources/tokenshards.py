"""Packed token shards: the binary export format training jobs consume.

After packing (functions/sampling pack_sequences, q131) a tokenized
corpus ships to the trainer as fixed-dtype binary shards, not parquet
— the Megatron/GPT-style ``.bin``+index layout. This module writes and
reads a SELF-DESCRIBING single-file variant so a plain ``binaryFile``
scan reconstructs everything with no sibling-file lookups:

    magic    b"TSH1"
    dtype    1 byte (2 -> uint16, 4 -> uint32), little-endian payload
    n_seqs   uint32 LE
    index    n_seqs x (seq_id int64 LE, n_tokens int32 LE)
    payload  token ids concatenated in index order
    crc32    uint32 LE over the payload (zlib.crc32)

Write protocol (the distributed-writer pattern): each Spark partition
writes ONE shard to a temp name and atomically renames it, then
returns a manifest row through the DataFrame plane; the caller
receives the manifest (path, n_seqs, n_tokens, n_bytes, crc32) and
commits ``manifest.json`` LAST — a reader that requires the manifest
never sees a partial export. Corrupt shards (bad magic / short file /
crc mismatch) are skipped by the reader with zero rows, the engine's
warn-and-skip policy.

Scale shape: one partition = one shard = one sequential write; no
shuffle on either side. Repartition upstream to pick the shard size
(trainers want 100-500 MB). At read time one shard = one task —
parallelism is the shard count, as with every non-splittable layout.
"""

from __future__ import annotations

import json
import os
import struct
import uuid
import zlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..operators.base import Sink, Source

_MAGIC = b"TSH1"
_DTYPES = {"uint16": (2, np.uint16, 65536), "uint32": (4, np.uint32, None)}


def write_token_shards(
    df: DataFrame,
    path: str,
    id_col: str = "seq_id",
    tokens_col: str = "tokens",
    dtype: str = "uint16",
) -> list[dict]:
    """Write one shard per input partition under ``path`` and commit
    ``manifest.json`` last. Returns the manifest entries. Token ids
    out of the dtype's range raise (a vocab/dtype mismatch must fail
    the export, not wrap silently)."""
    if dtype not in _DTYPES:
        raise ValueError(f"unsupported token dtype {dtype!r}")
    width, np_dtype, limit = _DTYPES[dtype]
    os.makedirs(path, exist_ok=True)

    def shard_writer(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids: list[int] = []
        lens: list[int] = []
        chunks: list[np.ndarray] = []
        for pdf in it:
            for sid, toks in zip(pdf[id_col], pdf[tokens_col]):
                if sid is None or toks is None:
                    continue
                arr = np.asarray(toks, dtype=np.int64)
                if arr.size and (
                    arr.min() < 0 or (limit and arr.max() >= limit)
                ):
                    raise ValueError(
                        f"token id out of range for dtype {dtype}"
                    )
                ids.append(int(sid))
                lens.append(int(arr.size))
                chunks.append(arr.astype(np_dtype))
        if not ids:  # empty partition: no shard, no manifest row
            yield pd.DataFrame(
                {"shard": [], "n_seqs": [], "n_tokens": [],
                 "n_bytes": [], "crc32": []}
            )
            return
        payload = (
            np.concatenate(chunks) if chunks else np.empty(0, np_dtype)
        ).tobytes()
        crc = zlib.crc32(payload) & 0xFFFFFFFF
        head = bytearray(_MAGIC)
        head.append(width)
        head += struct.pack("<I", len(ids))
        for sid, ln in zip(ids, lens):
            head += struct.pack("<qi", sid, ln)
        blob = bytes(head) + payload + struct.pack("<I", crc)
        name = f"shard-{uuid.uuid4().hex}.tokens"
        tmp = os.path.join(path, f".{name}.tmp")
        with open(tmp, "wb") as f:
            f.write(blob)
        os.rename(tmp, os.path.join(path, name))  # atomic publish
        yield pd.DataFrame(
            {
                "shard": [name],
                "n_seqs": [len(ids)],
                "n_tokens": [int(sum(lens))],
                "n_bytes": [len(blob)],
                "crc32": [crc],
            }
        )

    manifest_df = df.select(id_col, tokens_col).mapInPandas(
        shard_writer,
        schema=(
            "shard string, n_seqs long, n_tokens long,"
            " n_bytes long, crc32 long"
        ),
    )
    entries = [r.asDict() for r in manifest_df.collect()]
    entries.sort(key=lambda e: e["shard"])
    with open(os.path.join(path, "manifest.json"), "w") as f:
        json.dump({"dtype": dtype, "shards": entries}, f, indent=1)
    return entries


def parse_token_shard(blob: bytes):
    """(seq_ids, token_arrays) from one shard file; ValueError on
    corrupt framing or a payload crc mismatch."""
    if blob[:4] != _MAGIC:
        raise ValueError("not a token shard")
    width = blob[4]
    np_dtype = {2: np.uint16, 4: np.uint32}.get(width)
    if np_dtype is None:
        raise ValueError("unknown token dtype code")
    (n_seqs,) = struct.unpack_from("<I", blob, 5)
    pos = 9
    ids, lens = [], []
    for _ in range(n_seqs):
        if pos + 12 > len(blob):
            raise ValueError("truncated token shard index")
        sid, ln = struct.unpack_from("<qi", blob, pos)
        if ln < 0:
            raise ValueError("negative sequence length")
        ids.append(sid)
        lens.append(ln)
        pos += 12
    total = sum(lens)
    payload = blob[pos : pos + total * width]
    if len(payload) != total * width or pos + total * width + 4 > len(blob):
        raise ValueError("truncated token shard payload")
    (want,) = struct.unpack_from("<I", blob, pos + total * width)
    if zlib.crc32(payload) & 0xFFFFFFFF != want:
        raise ValueError("token shard crc mismatch")
    flat = np.frombuffer(payload, dtype=np_dtype).astype(np.int64)
    out, off = [], 0
    for ln in lens:
        out.append(flat[off : off + ln])
        off += ln
    return ids, out


def read_token_shards(
    spark: SparkSession, path: str, glob: str = "*.tokens"
) -> DataFrame:
    """Distributed shard scan -> (seq_id bigint, tokens array<int>).
    One shard = one task; corrupt shards yield no rows."""
    binaries = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, toks = [], []
            for blob in pdf["content"]:
                try:
                    sids, arrays = parse_token_shard(bytes(blob))
                except Exception:  # noqa: BLE001 - corrupt shard policy
                    continue
                ids.extend(sids)
                toks.extend([a.astype("int32").tolist() for a in arrays])
            yield pd.DataFrame(
                {
                    "seq_id": pd.Series(ids, dtype="int64"),
                    "tokens": pd.Series(toks, dtype="object"),
                }
            )

    return binaries.select("content").mapInPandas(
        batches, schema="seq_id bigint, tokens array<int>"
    )


class TokenShardSink(Sink):
    """Pipeline Sink for :func:`write_token_shards` (spec op
    ``token_shards_sink``). Not a ``_PathSink``: shard writing has its
    own commit protocol (shards first, manifest last)."""

    def __init__(
        self,
        path: str,
        id_col: str = "seq_id",
        tokens_col: str = "tokens",
        dtype: str = "uint16",
        name: str | None = None,
    ) -> None:
        super().__init__(name)
        self.path = path
        self.id_col = id_col
        self.tokens_col = tokens_col
        self.dtype = dtype

    def write(self, df: DataFrame, ctx) -> None:
        write_token_shards(
            df,
            ctx.resolve_url(self.path),
            id_col=self.id_col,
            tokens_col=self.tokens_col,
            dtype=self.dtype,
        )


class TokenShardSource(Source):
    """Pipeline Source for :func:`read_token_shards` (spec op
    ``token_shards``)."""

    def __init__(
        self, path: str, glob: str = "*.tokens", name: str | None = None
    ) -> None:
        super().__init__(name)
        self.path = path
        self.glob = glob

    def load(self, spark: SparkSession, ctx) -> DataFrame:
        return read_token_shards(
            spark, ctx.resolve_url(self.path), glob=self.glob
        )
