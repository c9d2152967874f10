"""Seeded differential fuzz for the r8 dialect surfaces.

The unit tests pin the designed-for cases; these sweeps hunt the cases
nobody designed for — random JSON documents (nested, unicode, quotes,
numeric edge tokens) through JSON_QUERY/JSON_VALUE/JSON_TYPE, and
random civil times through TIME_ADD/TIME_SUB/TIME_DIFF/TIME_TRUNC —
value-compared against DuckDB's native implementations, the same
adversarial-oracle pattern as tests/test_dml_fuzz.py.
"""

from __future__ import annotations

import json
import random

import duckdb
import pytest

from bigquery_etl_spark.sources.lake_sql import LakeCatalog

SEED = 0xA8A8


def _geo_seg_dist(px, py, ax, ay, bx, by):
    """Pure-Python mirror of the r11 geodesic point-to-arc closed form
    (bq_dialect._seg_geo_sql): great-circle arc segments, endpoint
    fallback outside the arc — shared by the GIS fuzz references."""
    import math

    r = 6371008.8

    def unit(lon, lat):
        la, lo = math.radians(lat), math.radians(lon)
        return (
            math.cos(la) * math.cos(lo),
            math.cos(la) * math.sin(lo),
            math.sin(la),
        )

    def cross(a, b):
        return (
            a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0],
        )

    def hav(x1, y1, x2, y2):
        return 2.0 * r * math.asin(math.sqrt(
            math.sin(math.radians(y2 - y1) / 2) ** 2
            + math.cos(math.radians(y1)) * math.cos(math.radians(y2))
            * math.sin(math.radians(x2 - x1) / 2) ** 2))

    if ax == bx and ay == by:
        return hav(ax, ay, px, py)
    A, B, P = unit(ax, ay), unit(bx, by), unit(px, py)
    n = cross(A, B)
    nn = math.sqrt(n[0] * n[0] + n[1] * n[1] + n[2] * n[2])
    nh = (n[0] / nn, n[1] / nn, n[2] / nn)
    u, v = cross(n, A), cross(B, n)

    def dot(a, b):
        return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]

    if dot(P, u) >= 0 and dot(P, v) >= 0:
        return r * math.asin(min(1.0, abs(dot(P, nh))))
    return min(hav(ax, ay, px, py), hav(bx, by, px, py))


def _rand_json(rng: random.Random, depth: int = 0):
    kinds = ["int", "float", "str", "bool", "null"]
    if depth < 2:
        kinds += ["obj", "arr", "obj", "arr"]
    k = rng.choice(kinds)
    if k == "int":
        return rng.randint(-10**9, 10**9)
    if k == "float":
        return rng.choice([0.5, -1.25, 3.0, 123.456, -0.0078125])
    if k == "str":
        alphabet = 'ab"\\\n\tcd é✓ $.[]'
        return "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 8)))
    if k == "bool":
        return rng.random() < 0.5
    if k == "null":
        return None
    if k == "obj":
        # deliberately UNSORTED key order
        keys = rng.sample(["z", "a", "m", "k1", "b2"], rng.randint(1, 4))
        return {kk: _rand_json(rng, depth + 1) for kk in keys}
    return [_rand_json(rng, depth + 1) for _ in range(rng.randint(0, 4))]


PATHS = ["$.z", "$.a", "$.m", "$.k1", "$.a.z", "$.a[0]", "$.nope", "$"]


def test_json_query_differential_fuzz(spark):
    rng = random.Random(SEED)
    docs = [
        json.dumps({"z": _rand_json(rng), "a": _rand_json(rng),
                    "m": _rand_json(rng)})
        for _ in range(150)
    ]
    df = spark.createDataFrame([(i, d) for i, d in enumerate(docs)],
                               "i long, doc string")
    df.createOrReplaceTempView("jf_docs")
    cat = LakeCatalog(spark)
    cols = []
    for n, p in enumerate(PATHS):
        cols.append(f"JSON_QUERY(doc, '{p}') AS q{n}")
        cols.append(f"JSON_VALUE(doc, '{p}') AS v{n}")
        cols.append(f"JSON_TYPE(doc, '{p}') AS t{n}")
    got = {
        r.i: r
        for r in cat.bq_sql(
            f"SELECT i, {', '.join(cols)} FROM jf_docs"
        ).collect()
    }

    con = duckdb.connect()
    con.execute("CREATE TABLE jf(i BIGINT, doc JSON)")
    con.executemany("INSERT INTO jf VALUES (?, ?)",
                    [(i, d) for i, d in enumerate(docs)])
    dcols = []
    for n, p in enumerate(PATHS):
        dcols.append(
            f"CASE WHEN json_type(doc, '{p}') = 'NULL' THEN 'null' "
            f"ELSE json_extract(doc, '{p}')::varchar END AS q{n}"
        )
        dcols.append(
            # BigQuery JSON_VALUE: NULL for non-scalars (DuckDB's
            # json_extract_string would return their JSON text)
            f"CASE WHEN json_type(doc, '{p}') IN ('OBJECT', 'ARRAY') "
            f"THEN NULL ELSE json_extract_string(doc, '{p}') END AS v{n}"
        )
        dcols.append(
            f"CASE WHEN json_type(doc, '{p}') IS NULL THEN NULL "
            f"WHEN json_type(doc, '{p}') = 'OBJECT' THEN 'object' "
            f"WHEN json_type(doc, '{p}') = 'ARRAY' THEN 'array' "
            f"WHEN json_type(doc, '{p}') = 'VARCHAR' THEN 'string' "
            f"WHEN json_type(doc, '{p}') = 'BOOLEAN' THEN 'boolean' "
            f"WHEN json_type(doc, '{p}') = 'NULL' THEN 'null' "
            f"ELSE 'number' END AS t{n}"
        )
    want = {
        r[0]: r
        for r in con.execute(
            f"SELECT i, {', '.join(dcols)} FROM jf"
        ).fetchall()
    }
    names = ["i"] + [f"{c}{n}" for n in range(len(PATHS)) for c in "qvt"]
    mismatches = []
    for i in got:
        g, w = got[i], want[i]
        for ci, (gv, wv) in enumerate(zip(tuple(g), w)):
            if gv != wv:
                mismatches.append(
                    (i, names[ci] if ci < len(names) else ci, gv, wv,
                     docs[i][:120])
                )
    assert not mismatches, mismatches[:5]


def test_time_arithmetic_differential_fuzz(spark):
    rng = random.Random(SEED + 1)
    rows = []
    for i in range(200):
        h, m, s = rng.randint(0, 23), rng.randint(0, 59), rng.randint(0, 59)
        frac = rng.choice(["", ".5", ".25", ".123", ".999999"])
        rows.append((i, f"{h:02d}:{m:02d}:{s:02d}{frac}",
                     rng.randint(-5000, 5000)))
    df = spark.createDataFrame(rows, "i long, t string, dm long")
    df.createOrReplaceTempView("tf_times")
    cat = LakeCatalog(spark)
    got = {
        r.i: (r.a, r.b, r.tr, r.d)
        for r in cat.bq_sql("""
            SELECT i,
                   TIME_ADD(t, INTERVAL 97 MINUTE) AS a,
                   TIME_SUB(t, INTERVAL 4321 SECOND) AS b,
                   TIME_TRUNC(t, MINUTE) AS tr,
                   TIME_DIFF(t, TIME '11:30:15', SECOND) AS d
            FROM tf_times
        """).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE tf(i BIGINT, t TIME, dm BIGINT)")
    con.executemany(
        "INSERT INTO tf VALUES (?, ?, ?)", [(i, t, dm) for i, t, dm in rows]
    )
    want = {
        r[0]: r[1:]
        for r in con.execute("""
            SELECT i,
                   (t + INTERVAL 97 MINUTE)::varchar,
                   (t - INTERVAL 4321 SECOND)::varchar,
                   make_time(hour(t), minute(t), 0)::varchar,
                   datediff('second', TIME '11:30:15', t)
            FROM tf
        """).fetchall()
    }
    mismatches = [
        (i, got[i], want[i], rows[i][1])
        for i in got
        if tuple(got[i]) != tuple(want[i])
    ]
    assert not mismatches, mismatches[:5]


def test_array_agg_ordered_differential_fuzz(spark):
    """Random (group, key, value) rows: ordered+limited ARRAY_AGG must
    match DuckDB's native ordered list() slice exactly (ties broken by
    the compound key on both engines)."""
    rng = random.Random(SEED + 2)
    rows = [
        (rng.randint(0, 9), rng.randint(0, 20), f"v{n}")
        for n in range(400)
    ]
    spark.createDataFrame(rows, "g int, k int, v string") \
        .createOrReplaceTempView("af_rows")
    cat = LakeCatalog(spark)
    got = {
        r.g: (r.asc3, r.desc2)
        for r in cat.bq_sql("""
            SELECT g,
                   ARRAY_TO_STRING(ARRAY_AGG(v ORDER BY k, v LIMIT 3),
                                   '|') AS asc3,
                   ARRAY_TO_STRING(ARRAY_AGG(v ORDER BY k DESC, v DESC
                                             LIMIT 2), '|') AS desc2
            FROM af_rows GROUP BY g
        """).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE af(g INT, k INT, v VARCHAR)")
    con.executemany("INSERT INTO af VALUES (?, ?, ?)", rows)
    want = {
        r[0]: r[1:]
        for r in con.execute("""
            SELECT g,
                   array_to_string(list(v ORDER BY k, v)[1:3], '|'),
                   array_to_string(list(v ORDER BY k DESC, v DESC)[1:2],
                                   '|')
            FROM af GROUP BY g
        """).fetchall()
    }
    assert got == want


def test_gis_polygon_differential_fuzz(spark):
    """Random convex rings (vertices on ellipses — convex by
    construction) × random points: ST_CONTAINS / ST_DISTANCE must match
    a pure-Python reference applying the identical formulas (the unroll
    and the reference share IEEE-double arithmetic, so agreement is
    near-exact)."""
    import math

    from bigquery_etl_spark.sources.lake_sql import LakeCatalog

    rng = random.Random(SEED + 3)
    cat = LakeCatalog(spark)

    def ref_contains(verts, px, py):
        # r12: GEODESIC reference — the winding method, an independent
        # algorithm from the lowering's S2 crossing predicate
        from bigquery_etl_spark.sources.bq_dialect import (
            _py_winding_inside,
            _unit3,
        )

        return _py_winding_inside([verts], _unit3(px, py))

    def ref_distance(verts, px, py):
        if ref_contains(verts, px, py):
            return 0.0
        # r11: geodesic arc segments (shared reference helper)
        n = len(verts)
        return min(
            _geo_seg_dist(px, py, *verts[i], *verts[(i + 1) % n])
            for i in range(n)
        )

    for trial in range(6):
        cx0, cy0 = rng.uniform(-60, 60), rng.uniform(-40, 40)
        a, b = rng.uniform(3, 25), rng.uniform(3, 20)
        k = rng.randint(3, 9)
        angles = sorted(rng.uniform(0, 2 * math.pi) for _ in range(k))
        verts = [
            (round(cx0 + a * math.cos(t), 6), round(cy0 + b * math.sin(t), 6))
            for t in angles
        ]
        wkt = "POLYGON((" + ", ".join(
            f"{x} {y}" for x, y in verts + [verts[0]]
        ) + "))"
        pts = [
            (i, rng.uniform(cx0 - 2 * a, cx0 + 2 * a),
             rng.uniform(cy0 - 2 * b, cy0 + 2 * b))
            for i in range(40)
        ]
        spark.createDataFrame(
            pts, "i long, lon double, lat double"
        ).createOrReplaceTempView("gfz_pts")
        rows = cat.bq_sql(
            f"SELECT i, ST_CONTAINS(ST_GEOGFROMTEXT('{wkt}'), "
            "ST_GEOGPOINT(lon, lat)) AS c, "
            f"ST_DISTANCE(ST_GEOGPOINT(lon, lat), "
            f"ST_GEOGFROMTEXT('{wkt}')) AS d FROM gfz_pts"
        ).collect()
        got = {r.i: (r.c, r.d) for r in rows}
        for i, px, py in pts:
            want_c = ref_contains(verts, px, py)
            want_d = ref_distance(verts, px, py)
            assert got[i][0] == want_c, (trial, i, verts, (px, py))
            if want_d == 0.0:
                assert got[i][1] == 0.0
            else:
                assert abs(got[i][1] - want_d) <= 1e-9 * want_d, (
                    trial, i, got[i][1], want_d
                )


def test_gis_polygon_concave_differential_fuzz(spark):
    """r9: random SIMPLE CONCAVE rings (star polygons — vertices at
    sorted angles with randomly varying radii are simple by
    construction and concave with high probability) plus a hole ring,
    differential against the identical pure-Python formulas. Extends
    the convex fuzz above per VERDICT r8 #3."""
    import math

    from bigquery_etl_spark.sources.lake_sql import LakeCatalog

    rng = random.Random(SEED + 9)
    cat = LakeCatalog(spark)

    def ref_contains(rings, px, py):
        # r12: GEODESIC reference (winding method, independent of the
        # lowering) — shell minus holes via per-ring winding parity
        from bigquery_etl_spark.sources.bq_dialect import (
            _py_winding_inside,
            _unit3,
        )

        q = _unit3(px, py)
        return (
            sum(1 for r in rings if _py_winding_inside([r], q)) % 2 == 1
        )

    def ref_distance(rings, px, py):
        if ref_contains(rings, px, py):
            return 0.0
        # r11: geodesic arc segments (shared reference helper);
        # zero-length edges skipped like the lowering does
        return min(
            _geo_seg_dist(px, py, *verts[i], *verts[(i + 1) % len(verts)])
            for verts in rings
            for i in range(len(verts))
            if verts[i] != verts[(i + 1) % len(verts)]
        )

    n_concave = 0
    for trial in range(6):
        cx0, cy0 = rng.uniform(-60, 60), rng.uniform(-40, 40)
        k = rng.randint(6, 12)
        angles = sorted(rng.uniform(0, 2 * math.pi) for _ in range(k))
        # reject angle sets with near-duplicate directions (they make
        # near-degenerate slivers that stress float equality, not logic)
        if min(
            (angles[(i + 1) % k] - angles[i]) % (2 * math.pi)
            for i in range(k)
        ) < 0.05:
            continue
        radii = [rng.uniform(5, 25) for _ in range(k)]
        verts = [
            (round(cx0 + r0 * math.cos(t), 6),
             round(cy0 + r0 * math.sin(t), 6))
            for t, r0 in zip(angles, radii)
        ]
        sign = 0
        convex = True
        for i in range(k):
            ax, ay = verts[i]
            bx, by = verts[(i + 1) % k]
            qx, qy = verts[(i + 2) % k]
            cr = (bx - ax) * (qy - ay) - (by - ay) * (qx - ax)
            if abs(cr) > 1e-9:
                s = 1 if cr > 0 else -1
                if sign and s != sign:
                    convex = False
                sign = s
        if convex:
            continue  # only count genuinely concave trials
        n_concave += 1
        # hole: small square sized from the ACTUAL min center-to-edge
        # distance (the star's kernel is tighter than the min-radius
        # disc — an edge between two far-apart angles can pass close
        # to the center)
        def _edge_dist(ax, ay, bx, by):
            dx, dy = bx - ax, by - ay
            l2 = dx * dx + dy * dy
            t = min(max((-(ax - cx0) * dx - (ay - cy0) * dy) / l2, 0.0), 1.0)
            ex, ey = ax + t * dx - cx0, ay + t * dy - cy0
            return math.hypot(ex, ey)

        kernel = min(
            _edge_dist(*verts[i], *verts[(i + 1) % k]) for i in range(k)
        )
        if kernel < 0.5:
            continue  # degenerate sliver — skip
        hr = 0.4 * kernel / math.sqrt(2.0)
        hole = [
            (round(cx0 - hr, 6), round(cy0 - hr, 6)),
            (round(cx0 + hr, 6), round(cy0 - hr, 6)),
            (round(cx0 + hr, 6), round(cy0 + hr, 6)),
            (round(cx0 - hr, 6), round(cy0 + hr, 6)),
        ]
        rings = [verts, hole]
        wkt = "POLYGON(" + ", ".join(
            "(" + ", ".join(f"{x} {y}" for x, y in ring + [ring[0]]) + ")"
            for ring in rings
        ) + ")"
        pts = [
            (i, rng.uniform(cx0 - 35, cx0 + 35),
             rng.uniform(cy0 - 35, cy0 + 35))
            for i in range(40)
        ]
        spark.createDataFrame(
            pts, "i long, lon double, lat double"
        ).createOrReplaceTempView("gfz_pts2")
        rows = cat.bq_sql(
            f"SELECT i, ST_CONTAINS(ST_GEOGFROMTEXT('{wkt}'), "
            "ST_GEOGPOINT(lon, lat)) AS c, "
            f"ST_DISTANCE(ST_GEOGPOINT(lon, lat), "
            f"ST_GEOGFROMTEXT('{wkt}')) AS d FROM gfz_pts2"
        ).collect()
        got = {r.i: (r.c, r.d) for r in rows}
        for i, px, py in pts:
            want_c = ref_contains(rings, px, py)
            want_d = ref_distance(rings, px, py)
            assert got[i][0] == want_c, (trial, i, rings, (px, py))
            if want_d == 0.0:
                assert got[i][1] == 0.0
            else:
                assert abs(got[i][1] - want_d) <= 1e-9 * want_d, (
                    trial, i, got[i][1], want_d
                )
    assert n_concave >= 3  # the seed must actually exercise concavity


def test_gis_multipoly_linestring_differential_fuzz(spark):
    """r10: random DISJOINT member polygons (two ellipse rings far
    apart — one with a centered hole) and random open polylines,
    differential against the identical pure-Python formulas. Extends
    the polygon fuzz per VERDICT r9 #3."""
    import math

    from bigquery_etl_spark.sources.lake_sql import LakeCatalog

    rng = random.Random(SEED + 17)
    cat = LakeCatalog(spark)

    def ref_contains(rings, px, py):
        # r12: GEODESIC reference (winding method, independent of the
        # lowering) — shell minus holes via per-ring winding parity
        from bigquery_etl_spark.sources.bq_dialect import (
            _py_winding_inside,
            _unit3,
        )

        q = _unit3(px, py)
        return (
            sum(1 for r in rings if _py_winding_inside([r], q)) % 2 == 1
        )

    def _hav(px, py, cx, cy):
        r = 6371008.8
        return 2.0 * r * math.asin(math.sqrt(
            math.sin(math.radians(py - cy) / 2) ** 2
            + math.cos(math.radians(cy)) * math.cos(math.radians(py))
            * math.sin(math.radians(px - cx) / 2) ** 2))

    def _seg_dist(px, py, ax, ay, bx, by):
        # r11: geodesic arc segments (shared reference helper)
        return _geo_seg_dist(px, py, ax, ay, bx, by)

    def ref_poly_distance(rings, px, py):
        if ref_contains(rings, px, py):
            return 0.0
        return min(
            _seg_dist(px, py, *verts[i], *verts[(i + 1) % len(verts)])
            for verts in rings
            for i in range(len(verts))
        )

    def _ellipse(cx0, cy0, a, b, k):
        angles = sorted(rng.uniform(0, 2 * math.pi) for _ in range(k))
        if min(
            (angles[(i + 1) % k] - angles[i]) % (2 * math.pi)
            for i in range(k)
        ) < 0.08:
            return None
        return [
            (round(cx0 + a * math.cos(t), 6),
             round(cy0 + b * math.sin(t), 6))
            for t in angles
        ]

    trials = 0
    for _ in range(24):
        if trials >= 4:
            break
        cx1, cy1 = rng.uniform(-70, -30), rng.uniform(-30, 30)
        cx2 = cx1 + rng.uniform(70, 100)  # guaranteed-disjoint members
        p1 = _ellipse(cx1, cy1, rng.uniform(6, 25), rng.uniform(6, 20),
                      rng.randint(4, 8))
        p2 = _ellipse(cx2, cy1, rng.uniform(6, 25), rng.uniform(6, 20),
                      rng.randint(4, 8))
        if p1 is None or p2 is None:
            continue
        trials += 1
        hr = 1.5
        hole = [
            (round(cx1 - hr, 6), round(cy1 - hr, 6)),
            (round(cx1 + hr, 6), round(cy1 - hr, 6)),
            (round(cx1 + hr, 6), round(cy1 + hr, 6)),
            (round(cx1 - hr, 6), round(cy1 + hr, 6)),
        ]
        polys = [[p1, hole], [p2]]
        wkt = "MULTIPOLYGON(" + ", ".join(
            "(" + ", ".join(
                "(" + ", ".join(
                    f"{x} {y}" for x, y in ring + [ring[0]]) + ")"
                for ring in poly
            ) + ")"
            for poly in polys
        ) + ")"
        # open polyline between the two members
        line = [
            (round(rng.uniform(cx1, cx2), 6),
             round(rng.uniform(cy1 - 30, cy1 + 30), 6))
            for _ in range(rng.randint(3, 6))
        ]
        lwkt = "LINESTRING(" + ", ".join(
            f"{x} {y}" for x, y in line) + ")"
        pts = [
            (i, rng.uniform(cx1 - 35, cx2 + 35),
             rng.uniform(cy1 - 35, cy1 + 35))
            for i in range(40)
        ]
        spark.createDataFrame(
            pts, "i long, lon double, lat double"
        ).createOrReplaceTempView("gfz_pts3")
        rows = cat.bq_sql(
            f"SELECT i, ST_CONTAINS(ST_GEOGFROMTEXT('{wkt}'), "
            "ST_GEOGPOINT(lon, lat)) AS c, "
            f"ST_DISTANCE(ST_GEOGPOINT(lon, lat), "
            f"ST_GEOGFROMTEXT('{wkt}')) AS d, "
            f"ST_DISTANCE(ST_GEOGPOINT(lon, lat), "
            f"ST_GEOGFROMTEXT('{lwkt}')) AS ld FROM gfz_pts3"
        ).collect()
        flat = [r for poly in polys for r in poly]
        got = {r.i: (r.c, r.d, r.ld) for r in rows}
        for i, px, py in pts:
            want_c = ref_contains(flat, px, py)
            want_d = ref_poly_distance(flat, px, py)
            want_ld = min(
                _seg_dist(px, py, *a, *b) for a, b in zip(line, line[1:])
            )
            assert got[i][0] == want_c, (i, polys, (px, py))
            if want_d == 0.0:
                assert got[i][1] == 0.0
            else:
                assert abs(got[i][1] - want_d) <= 1e-9 * want_d
            assert abs(got[i][2] - want_ld) <= 1e-9 * max(want_ld, 1.0)
    assert trials >= 4


def test_array_literal_classifier_fuzz():
    """Random compositions of subscripts (must survive) and bracket
    literals (must lower to ARRAY(...)) through the dialect's
    island-aware scanner — including nested literals, literals inside
    function args, and brackets inside string islands (untouchable)."""
    from bigquery_etl_spark.sources.bq_dialect import translate

    rng = random.Random(SEED + 4)
    for _ in range(120):
        parts, checks = ["SELECT "], []
        n_terms = rng.randint(1, 5)
        for t in range(n_terms):
            kind = rng.choice(["sub", "lit", "nested", "fnarg", "strisl"])
            if kind == "sub":
                idx = rng.randint(0, 9)
                parts.append(f"arr{t}[{idx}]")
                checks.append((f"arr{t}[{idx}]", True))  # must survive
            elif kind == "lit":
                vals = ", ".join(str(rng.randint(0, 99))
                                 for _ in range(rng.randint(0, 3)))
                parts.append(f"x{t} = [{vals}]")
                checks.append((f"ARRAY({vals})", True))
                checks.append((f"= [{vals}]", False))  # bracket gone
            elif kind == "nested":
                parts.append(f"c{t} = [[1, {t}], [2]]")
                checks.append((f"ARRAY(ARRAY(1, {t}), ARRAY(2))", True))
            elif kind == "fnarg":
                parts.append(f"SIZE([{t}, 7])")
                checks.append((f"SIZE(ARRAY({t}, 7))", True))
            else:
                parts.append(f"'[{t}, keep]'")
                checks.append((f"'[{t}, keep]'", True))  # island intact
            if t < n_terms - 1:
                parts.append(", ")
        src = "".join(parts)
        out = translate(src)
        for needle, present in checks:
            assert (needle in out) == present, (src, out, needle)


def test_approx_top_differential_fuzz(spark):
    """Random (group, value, weight) rows with planted NULLs:
    APPROX_TOP_COUNT/APPROX_TOP_SUM (exact top-k lowering, r10) must
    match a pure-Python reference applying the documented semantics —
    NULL values count, NULL weights drop the row, freq-desc then
    value-asc-NULL-last tie-break — for every k."""
    rng = random.Random(SEED + 7)
    rows = [
        (
            rng.randint(0, 3),
            rng.choice(["a", "b", "c", "d", None]),
            rng.choice([1, 2, 3, None]),
        )
        for _ in range(500)
    ]
    spark.createDataFrame(rows, "g int, x string, w int") \
        .createOrReplaceTempView("atf_rows")
    cat = LakeCatalog(spark)

    def ref(g, k, mode):
        acc = {}
        for gg, x, w in rows:
            if gg != g:
                continue
            if mode == "count":
                acc[x] = acc.get(x, 0) + 1
            elif w is not None:
                acc[x] = acc.get(x, 0) + w
        order = sorted(
            acc.items(),
            key=lambda kv: (-kv[1], kv[0] is None, kv[0] or ""),
        )
        return [(v, m) for v, m in order[:k]]

    for k in (1, 2, 3, 5):
        got = {
            r.g: [(e.value, e["count"]) for e in r.tc]
            for r in cat.bq_sql(
                f"SELECT g, APPROX_TOP_COUNT(x, {k}) AS tc "
                "FROM atf_rows GROUP BY g"
            ).collect()
        }
        assert got == {g: ref(g, k, "count") for g in range(4)}, k
        got_s = {
            r.g: [(e.value, e["sum"]) for e in r.ts]
            for r in cat.bq_sql(
                f"SELECT g, APPROX_TOP_SUM(x, w, {k}) AS ts "
                "FROM atf_rows GROUP BY g"
            ).collect()
        }
        assert got_s == {g: ref(g, k, "sum") for g in range(4)}, k
