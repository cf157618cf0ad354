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
import itertools
import sys

import h5py
import numpy as np


def _interleave(per_shard: list[list[str]]) -> list[str]:
    """Undo the extractor's strided split: shard i holds
    ``annotations[i::n]``, so round-robin across shards reconstructs the
    original annotation order exactly (uneven tails handled)."""
    out: list[str] = []
    for row in itertools.zip_longest(*per_shard):
        out.extend(x for x in row if x is not None)
    return out


def merge(shard_paths: list[str], output: str) -> dict[str, int]:
    """Merge ``shard_paths`` (in shard-index order) into ``output``.
    Returns counts. Raises on duplicate group keys (overlapping shards)."""
    per_shard_ids: list[list[str]] = []
    with h5py.File(output, "w") as out:
        for i, path in enumerate(shard_paths):
            with h5py.File(path, "r") as f:
                if i == 0:
                    for k, v in f.attrs.items():
                        out.attrs[k] = v
                # Every shard occupies a round-robin slot, even one with no
                # video_ids dataset (num_shards > remaining annotations makes
                # EmbeddingWriter skip the dataset for an empty id list) —
                # otherwise _interleave's stride shifts and the merged index
                # no longer reconstructs the original annotation order.
                per_shard_ids.append(
                    list(f["video_ids"].asstr()[:]) if "video_ids" in f else []
                )
                for key in f.keys():
                    if key == "video_ids":
                        continue
                    if isinstance(f[key], h5py.Group) and key in out:
                        # nested layout (e.g. trimmed_videos/): merge children
                        for sub in f[key].keys():
                            if sub in out[key]:
                                raise ValueError(
                                    f"duplicate group {key}/{sub} in {path}"
                                )
                            f.copy(f[key][sub], out[key], name=sub)
                        continue
                    if key in out:
                        raise ValueError(f"duplicate group {key} in {path}")
                    f.copy(f[key], out, name=key)
        all_ids = _interleave(per_shard_ids)
        if all_ids:
            out.create_dataset(
                "video_ids", data=np.array(all_ids, dtype=h5py.string_dtype())
            )
        # video-group count from the merged file itself (a group is a video
        # iff it holds an 'embeddings' dataset; containers like
        # trimmed_videos/ are walked one level)
        n_groups = 0
        for key, node in out.items():
            if not isinstance(node, h5py.Group):
                continue
            if "embeddings" in node:
                n_groups += 1
            else:
                n_groups += sum(
                    1 for sub in node.values()
                    if isinstance(sub, h5py.Group) and "embeddings" in sub
                )
        stats = {"groups": n_groups, "video_ids": len(all_ids)}
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
