"""Flagship pipeline: the north-star spatial-join + tile-assignment job.

    images (synthesized per input_hint schema)
      -> DecodeValidate          actor pool: decode + per-row invariants
      -> add_footprints          georeferenced box per image
      -> region PIP/intersects join (broadcast nation diamonds, STRtree
         actors) — the write_municipality_data enrichment step
         (/root/reference/src/sgis/io/write_municipality_data.py:144-195)
      -> covering-tile flat-map  raster<->vector assignment
      -> partitioned parquet sink by region, atomic per-partition files,
         checkpoint manifest with per-partition lineage + metrics,
         exact resume (state/manifest.py)

Payload discipline (SURVEY.md §7.5): image ``bytes`` do NOT ride through
the shuffle — the wide steps move only (image_id, doc_id, footprint,
region, tile) projections; the partitioned sink re-joins nothing because
the partition files are keyed by id and tile only. A consumer needing
pixels joins back by image_id against the source (Lance take-by-rowid at
scale).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .. import synth
from ..ops import spatial
from ..sources import images as img_src
from ..state import manifest as mf


def region_table(sf_dir: str) -> pa.Table:
    t = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey"])
    return synth.add_nation_diamonds(t)


class FusedFlagshipStage:
    """One actor pool for the whole per-image chain.

    build images -> decode+validate -> footprint -> region join (broadcast
    STRtree built once per actor) -> covering-tile flat-map, all inside a
    single ``__call__``. Keeping the chain in one pool avoids three actor
    pools fighting for the same CPUs and never ships the image ``bytes``
    between operators — the only wide step left in the job is the
    partitioned-write groupby.
    """

    def __init__(self, regions_ref, copies: int = 1, prebuilt: bool = False):
        import ray

        from ..geo import kernels, wkb as wkb_mod
        from ..ops.spatial import _BroadcastIndex

        self.idx = _BroadcastIndex(regions_ref)
        self.prebuilt = prebuilt  # input is already an image table (Lance)
        self.build = img_src.BuildImages(copies=copies)
        self.validate = img_src.DecodeValidate()
        self._wkb = wkb_mod
        self._kernels = kernels

    def __call__(self, batch: pa.Table) -> pa.Table:
        t = batch if self.prebuilt else self.build(batch)
        t = self.validate(t)
        t = img_src.add_footprints(t)
        slim = t.select(
            ["image_id", "doc_id", "decode_ok", "minx", "miny", "maxx", "maxy"]
        )
        boxes = np.stack(
            [slim[c].to_numpy(zero_copy_only=False).astype(np.float64)
             for c in ("minx", "miny", "maxx", "maxy")], axis=1,
        )
        slim = slim.append_column("geometry_wkb", self._wkb.encode_boxes_arrow(boxes))
        lpg = self._wkb.decode_polygons(slim["geometry_wkb"])
        qi, pi = self.idx.match_polygons(lpg)
        joined = slim.take(pa.array(qi, pa.int64()))
        joined = joined.append_column(
            "n_nationkey", self.idx.table["n_nationkey"].take(pa.array(pi, pa.int64()))
        )
        return _cover_with_region(joined)


def materialize_images(sf_dir: str, out_path: str, copies: int = 1,
                       concurrency=(1, 8)) -> str:
    """Materialize the image+caption table (input_hint schema) to a Lance
    dataset — parquet fallback when pylance is absent (sources/lance_io).
    Returns the format written. flagship(source_path=...) consumes it."""
    from ..sources import lance_io

    ds = img_src.images_dataset(sf_dir, concurrency=concurrency, copies=copies)
    return lance_io.write_table(ds, out_path, prefer="lance")


def flagship(sf_dir: str, out_dir: str, concurrency=(1, 8), copies: int = 1,
             source_path: str | None = None, subparts: int = 2) -> dict:
    """Run the flagship job; returns summary metrics.

    ``copies`` multiplies the image count per document (bench scale knob —
    the per-image work is identical, there is just more of it).
    ``source_path``: read the image table from a materialized Lance (or
    fallback parquet) dataset instead of synthesizing from documents —
    the north rule's Lance-first input path.
    ``subparts``: the sink partitions by region × (tile_x, tile_y mod
    subparts), giving 25·subparts² writer groups — writer parallelism is
    no longer capped at the 25 regions (VERDICT r1 flagship scale note);
    resume stays exact per sub-partition."""
    import ray
    import ray.data as rd

    regions_ref = ray.put(region_table(sf_dir))
    if source_path is not None:
        from ..sources import lance_io

        src = lance_io.read_dataset(source_path)
    else:
        src = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    tiled = src.map_batches(
        FusedFlagshipStage,
        fn_constructor_kwargs={
            "regions_ref": regions_ref, "copies": copies,
            "prebuilt": source_path is not None,
        },
        batch_format="pyarrow",
        batch_size=32,
        concurrency=concurrency,
    )

    def add_part_key(batch: pa.Table) -> pa.Table:
        nat = batch["n_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        bx = batch["tile_x"].to_numpy(zero_copy_only=False).astype(np.int64) % subparts
        by = batch["tile_y"].to_numpy(zero_copy_only=False).astype(np.int64) % subparts
        key = nat * (subparts * subparts) + bx * subparts + by
        return batch.append_column("part_key", pa.array(key, pa.int64()))

    tiled = tiled.map_batches(add_part_key, batch_format="pyarrow")
    rows = mf.write_partitioned_resumable(
        tiled, out_dir, partition_col="part_key", id_col="image_id",
        stage="flagship_tiles",
    )
    fresh = [r for r in rows if not r.get("resumed")]
    return {
        "partitions_written": len(fresh),
        "rows_written": int(sum(r["n_rows"] for r in fresh)),
        "bytes_written": int(sum(r["n_bytes"] for r in fresh)),
        "partitions_total": len(rows),
    }


def _cover_with_region(batch: pa.Table) -> pa.Table:
    cov = spatial.cover_tiles_flatmap(batch, synth.TILE, "image_id")
    # re-attach region + doc columns by positional repeat (cover preserves
    # input order and repeats rows contiguously)
    minx = batch["minx"].to_numpy(zero_copy_only=False).astype(np.int64)
    miny = batch["miny"].to_numpy(zero_copy_only=False).astype(np.int64)
    maxx = batch["maxx"].to_numpy(zero_copy_only=False).astype(np.int64)
    maxy = batch["maxy"].to_numpy(zero_copy_only=False).astype(np.int64)
    nx = (maxx - 1) // synth.TILE - minx // synth.TILE + 1
    ny = (maxy - 1) // synth.TILE - miny // synth.TILE + 1
    counts = nx * ny
    rows = np.repeat(np.arange(len(batch)), counts)
    out = cov
    for c in ("n_nationkey", "doc_id", "decode_ok"):
        out = out.append_column(c, batch[c].take(pa.array(rows, pa.int64())))
    return out
