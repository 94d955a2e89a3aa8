"""Circle-intersection geometry tests (the reference validated this layer
only by interactive matplotlib scenarios, circle_utils.py:716-806; these are
deterministic equivalents)."""

import math

import numpy as np
import pytest

from score_tpu.utils.circles import (
    Arc,
    Circle,
    CircleIntersection,
    Point,
    circles_have_no_overlap,
    disk_interval_on_circle,
    intersect_angular_intervals,
)

TWO_PI = 2 * math.pi


class TestPoint:
    def test_bearing_distance(self):
        p = Point(1.0, 1.0)
        assert p.bearing == pytest.approx(math.pi / 4)
        assert p.distance == pytest.approx(math.sqrt(2))

    def test_arithmetic(self):
        a, b = Point(1, 2), Point(3, 5)
        assert (a + b).x == 4 and (a + b).y == 7
        assert (b - a).x == 2 and (b - a).y == 3
        assert (-a).x == -1

    def test_angle_to_point(self):
        assert Point(0, 0).angle_to_point(Point(0, 1)) == pytest.approx(
            math.pi / 2
        )


class TestDiskInterval:
    def test_separated(self):
        c = Circle(Point(0, 0), 1.0)
        assert disk_interval_on_circle(c, Circle(Point(5, 0), 1.0)) is None

    def test_contained(self):
        c = Circle(Point(0, 0), 1.0)
        iv = disk_interval_on_circle(c, Circle(Point(0, 0), 3.0))
        assert iv == (0.0, TWO_PI)

    def test_crossing_symmetric(self):
        c = Circle(Point(0, 0), 1.0)
        iv = disk_interval_on_circle(c, Circle(Point(1, 0), 1.0))
        lo, hi = iv
        # interval centered at angle 0 with half-width acos(1/2) = pi/3
        assert (lo + hi) / 2 == pytest.approx(0.0)
        assert hi - lo == pytest.approx(2 * math.pi / 3)

    def test_disk_inside_circle(self):
        c = Circle(Point(0, 0), 5.0)
        assert disk_interval_on_circle(c, Circle(Point(0, 0), 1.0)) is None


class TestIntervalIntersection:
    def test_simple_overlap(self):
        out = intersect_angular_intervals([(0.0, 2.0), (1.0, 3.0)])
        assert len(out) == 1
        assert out[0] == pytest.approx((1.0, 2.0))

    def test_wraparound(self):
        out = intersect_angular_intervals([(-0.5, 0.5), (0.0, 1.0)])
        assert len(out) == 1
        lo, hi = out[0]
        assert lo == pytest.approx(0.0) and hi == pytest.approx(0.5)

    def test_disjoint(self):
        assert intersect_angular_intervals([(0.0, 1.0), (2.0, 3.0)]) == []

    def test_full_circle_neutral(self):
        out = intersect_angular_intervals([(0.0, TWO_PI), (1.0, 2.0)])
        assert out[0] == pytest.approx((1.0, 2.0))


class TestCircleIntersection:
    def test_two_circle_lens(self):
        ci = CircleIntersection()
        ci.add_circle(Circle(Point(0, 0), 1.0))
        ci.add_circle(Circle(Point(1, 0), 1.0))
        assert not ci.is_empty
        arcs = ci.boundary_arcs()
        assert len(arcs) == 2
        poly = ci.boundary_polygon()
        # lens region around (0.5, 0): every vertex inside both disks
        assert poly.shape[0] > 0
        for c in ci.circles:
            dists = np.hypot(poly[:, 0] - c.center.x, poly[:, 1] - c.center.y)
            assert np.all(dists <= c.radius + 1e-6)

    def test_three_circles_common_region(self):
        ci = CircleIntersection(
            [
                Circle(Point(0, 0), 1.5),
                Circle(Point(1, 0), 1.5),
                Circle(Point(0.5, 1), 1.5),
            ]
        )
        assert not ci.is_empty
        poly = ci.boundary_polygon()
        centroid = poly.mean(axis=0)
        for c in ci.circles:
            assert math.hypot(
                centroid[0] - c.center.x, centroid[1] - c.center.y
            ) < c.radius

    def test_empty_intersection(self):
        circles = [
            Circle(Point(0, 0), 1.0),
            Circle(Point(10, 0), 1.0),
        ]
        assert circles_have_no_overlap(circles)

    def test_nested_disks(self):
        ci = CircleIntersection(
            [Circle(Point(0, 0), 5.0), Circle(Point(0.5, 0), 1.0)]
        )
        # inner disk contained: intersection is the inner disk (not empty)
        assert not ci.is_empty
        arcs = ci.boundary_arcs()
        # boundary = full circle of the small disk
        assert sum(a.arc_length_radians for a in arcs) == pytest.approx(
            TWO_PI, abs=1e-6
        )

    def test_draw_produces_patch(self):
        import matplotlib

        matplotlib.use("Agg", force=True)
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots()
        ci = CircleIntersection(
            [Circle(Point(0, 0), 1.0), Circle(Point(1, 0), 1.0)]
        )
        patch = ci.draw_intersection(ax)
        assert patch is not None
        assert len(ci.draw_circles(ax)) == 2
        plt.close(fig)


class TestArc:
    def test_sample_on_perimeter(self):
        arc = Arc(Point(1.0, 2.0), 2.0, (0.0, math.pi / 2))
        pts = arc.sample(10)
        d = np.hypot(pts[:, 0] - 1.0, pts[:, 1] - 2.0)
        np.testing.assert_allclose(d, 2.0)

    def test_contains_angle(self):
        arc = Arc(Point(0, 0), 1.0, (6.0, 7.0))  # wraps past 2*pi
        assert arc.contains_angle(6.5 % TWO_PI)
        assert not arc.contains_angle(3.0)

    def test_empty(self):
        arc = Arc(Point(0, 0), 1.0, None)
        assert arc.is_empty
        assert arc.sample().shape == (0, 2)
        assert arc.end_points == []
