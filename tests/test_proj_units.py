"""Linear-unit (+units= / +to_meter= / WKT UNIT) machinery.

State-plane CRSs are published in US survey feet; PROJ semantics keep
+x_0/+y_0 in metres and divide OUTPUT coordinates by to_meter, while
WKT1 expresses FALSE_EASTING/NORTHING in the CRS unit. The unit
constants are exact public definitions (us-ft = 1200/3937 m, intl ft
= 0.3048 m), so the tests are dimensional-consistency checks of the
machinery against the metre-variant kernels — no new registry data.
"""

import numpy as np
import pytest

from georeader_spark.kernels.proj import (
    from_wgs84, parse_proj4, parse_wkt, to_wgs84,
)

US_FT = 1200.0 / 3937.0

# a CA-zone-5-shaped LCC (ftUS) — the canonical state-plane form
LCC_M = ("+proj=lcc +lat_1=35.46666666666667 +lat_2=34.03333333333333 "
         "+lat_0=33.5 +lon_0=-118 +x_0=2000000.0001016 "
         "+y_0=500000.0001016 +datum=NAD83")
LCC_FT = LCC_M + " +units=us-ft"

rng = np.random.default_rng(7)
LON = rng.uniform(-119.5, -116.5, 40)
LAT = rng.uniform(33.6, 35.3, 40)


class TestProj4Units:
    def test_usft_output_scaling(self):
        xm, ym = from_wgs84(LON, LAT, LCC_M)
        xf, yf = from_wgs84(LON, LAT, LCC_FT)
        np.testing.assert_allclose(xf * US_FT, xm, rtol=1e-14)
        np.testing.assert_allclose(yf * US_FT, ym, rtol=1e-14)

    def test_roundtrip_in_feet(self):
        xf, yf = from_wgs84(LON, LAT, LCC_FT)
        lon2, lat2 = to_wgs84(xf, yf, LCC_FT)
        np.testing.assert_allclose(lon2, LON, atol=1e-10)
        np.testing.assert_allclose(lat2, LAT, atol=1e-10)

    def test_to_meter_explicit_and_km(self):
        fam, p = parse_proj4(LCC_M + " +to_meter=0.3048")
        assert p["to_meter"] == 0.3048
        xm, ym = from_wgs84(LON, LAT, LCC_M)
        xk, yk = from_wgs84(LON, LAT, LCC_M + " +units=km")
        np.testing.assert_allclose(xk * 1000.0, xm, rtol=1e-14)

    def test_metre_units_noop(self):
        fam, p = parse_proj4(LCC_M + " +units=m")
        assert "to_meter" not in p

    def test_unsupported_units_raise(self):
        with pytest.raises(ValueError, match="units"):
            parse_proj4(LCC_M + " +units=link")
        with pytest.raises(ValueError, match="unsupported"):
            parse_proj4("+proj=merc +units=us-ft")

    def test_utm_with_units_routes_tm(self):
        fam, p = parse_proj4("+proj=utm +zone=11 +datum=WGS84 +units=us-ft")
        assert fam == "tm" and p["to_meter"] == pytest.approx(US_FT)
        xm, ym = from_wgs84(LON, LAT, "+proj=utm +zone=11 +datum=WGS84")
        xf, yf = from_wgs84(LON, LAT,
                            "+proj=utm +zone=11 +datum=WGS84 +units=us-ft")
        np.testing.assert_allclose(xf * US_FT, xm, atol=1e-6)

    def test_ups_units(self):
        fam, p = parse_proj4("+proj=ups +units=ft")
        assert fam == "ps" and p["to_meter"] == 0.3048


class TestWktUnits:
    def test_wkt_usft_matches_proj4(self):
        # FALSE_EASTING/NORTHING in ftUS (the WKT1 convention):
        fe = 2000000.0001016 / US_FT
        fn = 500000.0001016 / US_FT
        wkt = (
            'PROJCS["NAD83 / CA-5-shaped (ftUS)",'
            'GEOGCS["NAD83",DATUM["North_American_Datum_1983",'
            'SPHEROID["GRS 1980",6378137,298.257222101]],'
            'PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],'
            'PROJECTION["Lambert_Conformal_Conic_2SP"],'
            'PARAMETER["standard_parallel_1",35.46666666666667],'
            'PARAMETER["standard_parallel_2",34.03333333333333],'
            'PARAMETER["latitude_of_origin",33.5],'
            'PARAMETER["central_meridian",-118],'
            f'PARAMETER["false_easting",{fe!r}],'
            f'PARAMETER["false_northing",{fn!r}],'
            'UNIT["US survey foot",0.30480060960121920]]'
        )
        fam, p = parse_wkt(wkt)
        assert fam == "lcc2sp"
        assert p["to_meter"] == pytest.approx(US_FT, rel=1e-12)
        # x_0 converted ft -> m at parse time
        assert p["x_0"] == pytest.approx(2000000.0001016, abs=1e-4)
        xw, yw = from_wgs84(LON, LAT, wkt)
        xf, yf = from_wgs84(LON, LAT, LCC_FT)
        np.testing.assert_allclose(xw, xf, atol=1e-5)
        np.testing.assert_allclose(yw, yf, atol=1e-5)

    def test_wkt_metre_unit_unchanged(self):
        wkt = (
            'PROJCS["metre grid",GEOGCS["WGS 84",DATUM["WGS_1984",'
            'SPHEROID["WGS 84",6378137,298.257223563]],'
            'PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],'
            'PROJECTION["Transverse_Mercator"],'
            'PARAMETER["scale_factor",0.9996],'
            'PARAMETER["central_meridian",9],'
            'PARAMETER["false_easting",500000],'
            'PARAMETER["false_northing",0],UNIT["metre",1]]'
        )
        fam, p = parse_wkt(wkt)
        assert fam == "tm" and "to_meter" not in p and p["x_0"] == 500000
