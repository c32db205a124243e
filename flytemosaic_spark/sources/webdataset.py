"""WebDataset-style tar shards — the standard multimodal training
layout (one tar per shard; each sample is a group of members sharing
a key prefix: ``000042.png`` + ``000042.txt`` + ``000042.cls``).

Training jobs stream these shards sequentially; a curation/indexing
pipeline reads them as binary payloads and EXPLODES one row per
sample — which is exactly the Spark shape here (mapInPandas: shard
bytes in, typed sample rows out; payloads never shuffle). Tar framing
is stdlib ``tarfile`` over BytesIO; the member decode goes through
the repo's own codecs.
"""

from __future__ import annotations

import io
import tarfile


def parse_shard(payload: bytes) -> list[dict]:
    """Group tar members by key prefix -> ``[{"key", "parts":
    {ext: bytes}}]`` in first-appearance order (WebDataset keeps a
    sample's members adjacent; we tolerate any order)."""
    samples: dict[str, dict] = {}
    order: list[str] = []
    with tarfile.open(fileobj=io.BytesIO(payload)) as tf:
        for member in tf.getmembers():
            if not member.isfile():
                continue
            name = member.name.rsplit("/", 1)[-1]
            if "." not in name:
                raise ValueError(f"tar member {name!r} has no extension")
            key, ext = name.split(".", 1)
            if key not in samples:
                samples[key] = {"key": key, "parts": {}}
                order.append(key)
            samples[key]["parts"][ext] = tf.extractfile(member).read()
    return [samples[k] for k in order]


def write_shard(samples: list[tuple[str, dict]]) -> bytes:
    """``[(key, {ext: bytes})]`` -> a deterministic tar shard (epoch
    mtimes, zeroed owner) — the parser's oracle and the probe fixture
    path."""
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for key, parts in samples:
            for ext in sorted(parts):
                data = parts[ext]
                info = tarfile.TarInfo(name=f"{key}.{ext}")
                info.size = len(data)
                info.mtime = 0
                info.uid = info.gid = 0
                info.uname = info.gname = ""
                tf.addfile(info, io.BytesIO(data))
    return buf.getvalue()
