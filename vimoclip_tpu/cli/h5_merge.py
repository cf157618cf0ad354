"""Merge sharded embedding HDF5 files into one reference-layout file.

Companion to ``extract-embeddings --num-shards/--shard-index`` (corpus split
across machines — the single-writer HDF5 constraint means each job writes
its own file). Groups are copied verbatim (datasets, attrs, nesting — both
the AK flat and MN ``trimmed_videos/`` layouts); file attrs come from the
first shard; the top-level ``video_ids`` index is the concatenation of the
shards' indexes, preserving each shard's order (so the merged index matches
what a single unsharded run of the reference would have produced,
extract_embeddings.py:118-119).
"""

from __future__ import annotations

import argparse
import sys

import h5py
import numpy as np


def merge(shard_paths: list[str], output: str) -> dict[str, int]:
    """Merge ``shard_paths`` into ``output``. Returns counts. Raises on
    duplicate group keys (overlapping shards)."""
    stats = {"groups": 0, "video_ids": 0}
    all_ids: list[str] = []
    with h5py.File(output, "w") as out:
        for i, path in enumerate(shard_paths):
            with h5py.File(path, "r") as f:
                if i == 0:
                    for k, v in f.attrs.items():
                        out.attrs[k] = v
                for key in f.keys():
                    if key == "video_ids":
                        all_ids.extend(f["video_ids"].asstr()[:])
                        continue
                    if isinstance(f[key], h5py.Group) and key in out:
                        # nested layout (e.g. trimmed_videos/): merge children
                        for sub in f[key].keys():
                            if sub in out[key]:
                                raise ValueError(
                                    f"duplicate group {key}/{sub} in {path}"
                                )
                            f.copy(f[key][sub], out[key], name=sub)
                            stats["groups"] += 1
                        continue
                    if key in out:
                        raise ValueError(f"duplicate group {key} in {path}")
                    f.copy(f[key], out, name=key)
                    if isinstance(f[key], h5py.Group):
                        stats["groups"] += 1
        if all_ids:
            out.create_dataset(
                "video_ids", data=np.array(all_ids, dtype=h5py.string_dtype())
            )
            stats["video_ids"] = len(all_ids)
    return stats


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(
        description="Merge sharded embedding HDF5 files into one"
    )
    p.add_argument("shards", nargs="+", help="shard files, in shard order")
    p.add_argument("--output", required=True)
    args = p.parse_args(argv)
    try:
        stats = merge(args.shards, args.output)
    except ValueError as e:
        print(f"merge failed: {e}", file=sys.stderr)
        return 1
    print(
        f"merged {len(args.shards)} shards -> {args.output}: "
        f"{stats['groups']} video groups, {stats['video_ids']} indexed ids"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
