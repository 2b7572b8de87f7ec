"""DE-9IM box predicate surface for raster tile selection
(AccumuloRasterQueryPlanner: interior-intersects AND NOT touches)."""

import numpy as np

from geomesa_ray.pipelines.tiles import box_tile_relations


class TestBoxTileRelations:
    def test_aligned_edges_touch_and_are_not_interior(self):
        # left (-45) and bottom (-22.5) are tile-aligned at level 4
        t = box_tile_relations(-45.0, 30.0, -22.5, 30.0, level=4)
        rels = t.column("relation").to_pylist()
        interior = t.column("interior").to_pylist()
        assert "touches" in rels
        assert "within" in rels  # fully-covered interior tiles
        assert "overlaps" in rels  # partially-covered edge tiles
        # the raster fetch predicate: interior iff not touches
        for r, i in zip(rels, interior):
            assert i == (r != "touches")
        assert "disjoint" not in rels

    def test_tiny_box_inside_one_tile(self):
        t = box_tile_relations(1.0, 2.0, 1.0, 2.0, level=4)
        rels = t.column("relation").to_pylist()
        assert rels.count("contains") == 1  # the tile contains the box
        assert all(r in ("contains", "touches") for r in rels)

    def test_whole_world_equals_at_level_0(self):
        t = box_tile_relations(-180.0, 180.0, -90.0, 90.0, level=0)
        assert t.column("relation").to_pylist() == ["equals"]
        assert t.column("interior").to_pylist() == [True]

    def test_exact_tile_bounds_equals(self):
        # one level-4 tile exactly: its 8 edge/corner neighbors touch
        t = box_tile_relations(-45.0, -22.5, -22.5, -11.25, level=4)
        rels = t.column("relation").to_pylist()
        assert rels.count("equals") == 1
        assert rels.count("touches") == 8
        assert len(rels) == 9
