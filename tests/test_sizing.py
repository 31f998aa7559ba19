"""plans/sizing.py — footer-derived shuffle-partition and heap sizing.

Pins the heuristic at three scales (the verdict's acceptance bar), its
floor/cap behavior, and the heap plateau property (capacity follows
concurrency once partitions track the data). Footprints come from real
driver testdata footers; decade points use the measured byte totals of
the generated 10x/100x/1000x dirs so the pins hold without those dirs
on disk.
"""

from __future__ import annotations

import os

import pytest

from simple_map_reduce_ruuner_spark.plans.sizing import (
    EXPLODE_FACTOR,
    MAX_PARTITIONS,
    TARGET_PARTITION_BYTES,
    _mem_to_gb,
    dataset_footprint,
    derive_shuffle_partitions,
    recommend_driver_mem_gb,
)

SF01 = "/root/testdata/sf0.1"

# measured uncompressed footer totals of the generated scale dirs
# (tools/make_scale_data.py replicas; see ROUND11_NOTES.md)
BYTES_SF01 = 23_000_000  # sf0.1, all tables
BYTES_SF10 = 2_170_000_000  # 100x dir, all tables
BYTES_DOCS1000 = 1_577_000_000  # 1000x documents-only dir


def test_three_scale_pins():
    """The verdict's acceptance points: bench scale stays at the core
    count; the 1000x docs dir lands in the sweep-validated band (the
    r11 sweep measured 32/96/256; the heuristic must sit within the
    region whose best rep is within ~1.3x of the overall best)."""
    assert derive_shuffle_partitions(BYTES_SF01, cpus=32) == 32
    assert derive_shuffle_partitions(BYTES_SF10, cpus=32) == 130
    assert derive_shuffle_partitions(BYTES_DOCS1000, cpus=32) == 94


def test_partitions_floor_and_cap():
    assert derive_shuffle_partitions(0, cpus=32) == 32  # empty dataset
    assert derive_shuffle_partitions(1, cpus=8) == 8
    assert derive_shuffle_partitions(10**15, cpus=32) == MAX_PARTITIONS


def test_partitions_monotone_in_bytes():
    pts = [
        derive_shuffle_partitions(b, cpus=32)
        for b in (10**6, 10**8, 10**9, 10**10, 10**11)
    ]
    assert pts == sorted(pts)


def test_per_task_bytes_never_exceed_target():
    """The invariant that prevents the r10 OOM class: once above the
    core-count floor, each task's working-set share stays at or under
    the per-task byte target."""
    for b in (10**9, 10**10, 10**11, 10**12):
        parts = derive_shuffle_partitions(b, cpus=32)
        if 32 < parts < MAX_PARTITIONS:  # between floor and cap
            assert b * EXPLODE_FACTOR / parts <= TARGET_PARTITION_BYTES * 1.01


def test_heap_recommendation_plateaus():
    """Heap tracks CONCURRENCY, not total data: tiny data gets the
    4 g floor, and from the point partitions bind to the byte target
    the recommendation is flat (30 g here) no matter how much bigger
    the data gets — exactly how per-executor memory is sized on a
    real cluster."""
    assert recommend_driver_mem_gb(BYTES_SF01, cpus=32) == 4
    plateau = recommend_driver_mem_gb(BYTES_DOCS1000, cpus=32)
    assert plateau == 28
    assert recommend_driver_mem_gb(BYTES_DOCS1000 * 10, cpus=32) == plateau
    # and the r10 bracket is reproduced: 8g OOM'd, 48g worked
    assert 8 < plateau <= 48
    # past the MAX_PARTITIONS cap the per-task share grows again and the
    # recommendation climbs toward the box ceiling — also by design
    assert recommend_driver_mem_gb(BYTES_DOCS1000 * 100, cpus=32) > plateau


def test_footprint_reads_real_footers():
    fp = dataset_footprint(SF01)
    assert fp["rows"] == 893_030  # TESTDATA.md row total at sf0.1
    # uncompressed bytes in the ballpark the pins above assume
    assert 0.7 * BYTES_SF01 < fp["uncompressed_bytes"] < 1.3 * BYTES_SF01
    docs_only = dataset_footprint(SF01, tables=["documents"])
    assert docs_only["rows"] == 5_000
    assert docs_only["paths"] == 1


def test_explode_factor_override_scales_both_knobs():
    """The per-operator expansion hint (generator-shaped operators whose
    blow-up happens after the exchange, e.g. wedge-pair counting) must
    reach BOTH derived quantities: more partitions and a matching (or
    plateaued) heap recommendation."""
    base = derive_shuffle_partitions(BYTES_SF10, cpus=32)
    hinted = derive_shuffle_partitions(BYTES_SF10, cpus=32, explode_factor=64)
    # linear in the hint between floor and cap (up to ceil rounding)
    assert abs(hinted - base * 8) <= 8
    assert recommend_driver_mem_gb(
        BYTES_SF10, cpus=32, explode_factor=64
    ) >= recommend_driver_mem_gb(BYTES_SF10, cpus=32)


def test_mem_to_gb_units():
    assert _mem_to_gb("8g") == 8.0
    assert _mem_to_gb("512m") == 0.5
    assert _mem_to_gb("30G") == 30.0
    # suffix-less = MiB, matching Spark's byteStringAsMb (advice r11):
    # a bare `spark.driver.memory=49152` means 48 GiB, not 48 KiB
    assert _mem_to_gb("49152") == 48.0


def test_apply_dataset_sizing_sets_conf_and_warns(spark):
    import warnings

    from simple_map_reduce_ruuner_spark.plans.sizing import (
        apply_dataset_sizing,
    )

    saved = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            out = apply_dataset_sizing(spark, SF01, cpus=32)
        assert out["shuffle_partitions"] == 32
        assert spark.conf.get("spark.sql.shuffle.partitions") == "32"
        # sf0.1 recommendation is the 4g floor; the test session heap
        # may be under it, so just assert the advisory fields exist
        assert out["recommended_heap_gb"] >= 4
        assert isinstance(out["live_heap"], str)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", saved)
