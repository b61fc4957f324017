"""plans/cache.py: site-keyed persist registry bounds cached-table leaks."""

import sys

sys.path.insert(0, "/root/repo")


def test_register_persisted_bounds_to_one_per_site(spark):
    from esper_tv_spark.plans.cache import _LIVE, register_persisted, release_all

    a = spark.range(10)
    b = spark.range(20)
    register_persisted("t.site", a)
    a.count()
    assert a.storageLevel.useMemory
    register_persisted("t.site", b)
    b.count()
    # the previous registration is unpersisted, the new one live
    assert not a.storageLevel.useMemory
    assert b.storageLevel.useMemory
    assert len([k for k in _LIVE if k == "t.site"]) == 1
    release_all()
    assert not b.storageLevel.useMemory
    assert "t.site" not in _LIVE


def test_plant_offset_collision_guard():
    import numpy as np
    import pytest

    sys.path.insert(0, "/root/repo/tools")
    from make_scale import plant_offset

    # shipped-fixture regime: ids well under 500k keep the historic offset
    assert plant_offset(np.array([0, 1, 1999]), 50) == 500_000
    # large base ids: offset derived from max+1 (plants come from the
    # small-id head, so the block still fits under the 1M copy stride)
    assert plant_offset(np.array([0, 1, 2, 600_000]), 3) == 600_001
    # overflow of the 1M copy stride must assert, never wrap
    with pytest.raises(AssertionError):
        plant_offset(np.array([999_999]), 5)
