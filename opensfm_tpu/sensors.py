"""Camera sensor-width database (mm) for focal-prior computation.

TPU-build equivalent of the reference's `data/sensor_data.json` lookup
(reference exif.py:62-88 via context.py:20): when EXIF lacks
FocalLengthIn35mmFilm, the focal prior is focal_mm / sensor_width_mm.

The built-in table is a curated set of common camera bodies, phones, action
cameras and drones keyed by the reference's `sensor_string(make, model)`
normalization ("make model", lowercased, duplicate make stripped).  It is
written from public sensor-format specifications, not copied from the
reference's database.  Users can extend or override it by dropping a
`sensor_data.json` file ({"make model": width_mm}) either next to their
dataset (loaded by exif extraction via `load_extra_sensor_data`) or at the
path in the OPENSFM_TPU_SENSOR_DATA environment variable.
"""

from __future__ import annotations

import json
import logging
import os
from typing import Dict, Optional

logger = logging.getLogger(__name__)

# Common sensor formats (width in mm):
#   full frame 36.0 | APS-H 27.9 | APS-C Canon 22.3 | APS-C 23.5/23.6
#   Four Thirds 17.3 | 1" 13.2 | 2/3" 8.8 | 1/1.7" 7.6 | 1/2.3" 6.17
#   1/2.5" 5.76 | 1/3" 4.8 | 1/3.2" 4.54
_FULL = 36.0
_APSC_CANON = 22.3
_APSC = 23.5
_FT = 17.3
_ONE = 13.2
_2_3 = 8.8
_1_17 = 7.6
_1_23 = 6.17
_1_25 = 5.76

_BUILTIN: Dict[str, float] = {}


def _add(make: str, models: Dict[str, float]) -> None:
    for model, width in models.items():
        _BUILTIN[f"{make} {model}".strip().lower()] = width


_add("canon", {
    **{f"eos 5d{s}": _FULL for s in ["", " mark ii", " mark iii", " mark iv", "s", "s r"]},
    **{f"eos {m}": _FULL for m in ["6d", "6d mark ii", "1d x", "1d x mark ii",
                                   "1d x mark iii", "r", "r5", "r6", "r6 mark ii",
                                   "r8", "rp", "1ds mark iii"]},
    **{f"eos {m}": _APSC_CANON for m in [
        "7d", "7d mark ii", "20d", "30d", "40d", "50d", "60d", "70d", "77d",
        "80d", "90d", "100d", "200d", "250d", "300d", "350d", "400d", "450d",
        "500d", "550d", "600d", "650d", "700d", "750d", "760d", "800d",
        "850d", "1000d", "1100d", "1200d", "1300d", "2000d", "4000d",
        "rebel t2i", "rebel t3i", "rebel t4i", "rebel t5i", "rebel t6i",
        "rebel t7i", "rebel t6", "rebel t7", "m", "m3", "m5", "m6", "m50",
        "m100", "m200", "r7", "r10", "r50"]},
    **{f"powershot {m}": _1_17 for m in [
        "g7", "g9", "g10", "g11", "g12", "g15", "g16", "s90", "s95", "s100",
        "s110", "s120"]},
    **{f"powershot {m}": _ONE for m in ["g7 x", "g7 x mark ii", "g7 x mark iii",
                                        "g9 x", "g5 x", "g3 x"]},
    **{f"powershot {m}": _1_23 for m in [
        "sx260 hs", "sx280 hs", "sx600 hs", "sx700 hs", "sx710 hs",
        "a1400", "a2300", "a2500", "elph 130 is", "elph 160", "elph 180",
        "d30", "sx50 hs", "sx60 hs"]},
})

_add("nikon", {
    **{m: _FULL for m in [
        "d3", "d3s", "d3x", "d4", "d4s", "d5", "d6", "d600", "d610", "d700",
        "d750", "d780", "d800", "d800e", "d810", "d850", "df",
        "z 5", "z 6", "z 6_2", "z 7", "z 7_2", "z 8", "z 9", "z 6ii", "z 7ii"]},
    **{m: _APSC for m in [
        "d40", "d40x", "d50", "d60", "d70", "d70s", "d80", "d90", "d100",
        "d200", "d300", "d300s", "d500", "d3000", "d3100", "d3200", "d3300",
        "d3400", "d3500", "d5000", "d5100", "d5200", "d5300", "d5500",
        "d5600", "d7000", "d7100", "d7200", "d7500", "z 50", "z 30", "z fc"]},
    **{f"coolpix {m}": _1_23 for m in [
        "aw100", "aw110", "aw120", "aw130", "s9100", "s9300", "s9500",
        "p500", "p510", "p520", "p530", "p600", "p610", "p900", "p950",
        "l820", "l830", "l840", "b500", "b600", "b700"]},
    **{f"coolpix {m}": _1_17 for m in ["p7000", "p7100", "p7700", "p7800"]},
    "coolpix a": _APSC,
    **{f"1 {m}": _ONE for m in ["j1", "j2", "j3", "j4", "j5", "v1", "v2", "v3",
                                "s1", "s2", "aw1"]},
})

_add("sony", {
    **{f"ilce-{m}": _FULL for m in [
        "7", "7m2", "7m3", "7m4", "7r", "7rm2", "7rm3", "7rm4", "7rm5",
        "7s", "7sm2", "7sm3", "7c", "9", "9m2", "1"]},
    **{f"ilce-{m}": _APSC for m in ["5000", "5100", "6000", "6100", "6300",
                                    "6400", "6500", "6600", "6700", "3000"]},
    **{f"nex-{m}": _APSC for m in ["3", "3n", "5", "5n", "5r", "5t", "6", "7",
                                   "c3", "f3"]},
    **{f"slt-a{m}": _APSC for m in ["33", "35", "37", "55", "57", "58", "65",
                                    "77", "77v"]},
    "slt-a99": _FULL, "slt-a99v": _FULL,
    **{f"dsc-rx100{m}": _ONE for m in ["", "m2", "m3", "m4", "m5", "m6", "m7"]},
    "dsc-rx10": _ONE, "dsc-rx10m2": _ONE, "dsc-rx10m3": _ONE, "dsc-rx10m4": _ONE,
    "dsc-rx1": _FULL, "dsc-rx1rm2": _FULL,
    **{f"dsc-{m}": _1_23 for m in [
        "hx50", "hx50v", "hx60", "hx60v", "hx80", "hx90", "hx90v", "hx99",
        "wx300", "wx350", "wx500", "w800", "w810", "w830", "h300", "h400"]},
})

_add("fujifilm", {
    **{f"x-{m}": _APSC for m in [
        "t1", "t2", "t3", "t4", "t5", "t10", "t20", "t30", "t100", "t200",
        "e1", "e2", "e3", "e4", "a1", "a2", "a3", "a5", "a7", "pro1",
        "pro2", "pro3", "h1", "h2", "s1", "m1", "s10"]},
    "x100": _APSC, "x100s": _APSC, "x100t": _APSC, "x100f": _APSC, "x100v": _APSC,
    "x70": _APSC, "xf10": _APSC,
    **{f"finepix {m}": _1_23 for m in [
        "s4000", "s4200", "s4500", "s8600", "s9400w", "xp70", "xp80",
        "xp90", "xp120", "xp130", "xp140"]},
})

_add("olympus", {
    **{m: _FT for m in [
        "e-m1", "e-m1 mark ii", "e-m1 mark iii", "e-m1x", "e-m5",
        "e-m5 mark ii", "e-m5 mark iii", "e-m10", "e-m10 mark ii",
        "e-m10 mark iii", "e-m10 mark iv", "e-p1", "e-p2", "e-p3", "e-p5",
        "e-pl1", "e-pl2", "e-pl3", "e-pl5", "e-pl6", "e-pl7", "e-pl8",
        "e-pl9", "e-pl10", "pen-f", "e-5", "e-3", "e-30", "e-620", "e-520",
        "e-420"]},
    "tg-4": _1_23, "tg-5": _1_23, "tg-6": _1_23, "tg-860": _1_23,
    "sh-2": _1_23, "stylus 1": _1_17,
})

_add("panasonic", {
    **{f"dmc-{m}": _FT for m in [
        "g1", "g2", "g3", "g5", "g6", "g7", "g80", "g85", "gh1", "gh2",
        "gh3", "gh4", "gh5", "gx1", "gx7", "gx8", "gx80", "gx85", "gf1",
        "gf2", "gf3", "gf5", "gf6", "gf7", "gm1", "gm5"]},
    "dc-g9": _FT, "dc-gh5": _FT, "dc-gh5s": _FT, "dc-gh6": _FT,
    "dc-gx9": _FT, "dc-g90": _FT, "dc-g95": _FT, "dc-g100": _FT,
    "dc-s1": _FULL, "dc-s1r": _FULL, "dc-s1h": _FULL, "dc-s5": _FULL,
    **{f"dmc-{m}": _ONE for m in ["lx100", "fz1000", "fz2000", "fz2500",
                                  "tz100", "tz110", "zs100", "zs110"]},
    **{f"dmc-{m}": _1_23 for m in [
        "tz60", "tz70", "tz80", "zs40", "zs50", "zs60", "fz70", "fz80",
        "fz200", "fz300", "ft5", "ft30", "ts5", "ts6", "sz10"]},
    "dmc-lx7": _1_17, "dmc-lx10": _ONE, "dmc-lx15": _ONE,
})

_add("pentax", {
    **{m: _APSC for m in [
        "k-3", "k-3 ii", "k-5", "k-5 ii", "k-5 iis", "k-7", "k-30", "k-50",
        "k-70", "k-500", "k-x", "k-r", "k-m", "k-s1", "k-s2", "k10d",
        "k20d", "k100d", "k200d", "kp"]},
    "k-1": _FULL, "k-1 mark ii": _FULL,
    "wg-3": _1_23, "wg-10": _1_23, "wg-30": _1_23,
})

_add("leica", {
    "m8": 27.0, "m9": _FULL, "m10": _FULL, "m (typ 240)": _FULL,
    "q (typ 116)": _FULL, "q2": _FULL, "sl (typ 601)": _FULL, "sl2": _FULL,
})

_add("ricoh", {
    "gr": _APSC, "gr ii": _APSC, "gr iii": _APSC, "gr digital iv": _1_17,
    "theta s": _1_23, "theta v": _1_23, "theta z1": 7.3,
})

_add("gopro", {
    **{m: _1_23 for m in [
        "hero3-black edition", "hero3+ black edition", "hero4 black",
        "hero4 silver", "hero4 session", "hero5 black", "hero5 session",
        "hero6 black", "hero7 black", "hero8 black", "hero9 black",
        "hero10 black", "hero11 black", "hd2", "hero", "hero2", "hero3",
        "hero4", "hero5", "hero6", "hero7", "max", "fusion"]},
})

_add("dji", {
    # Phantom / Mavic / Air camera module names as reported in EXIF.
    "fc200": _1_23,       # Phantom 2 Vision+
    "fc300c": _1_23,      # Phantom 3 Standard
    "fc300s": _1_23,      # Phantom 3 Professional
    "fc300x": _1_23,      # Phantom 3 4K
    "fc330": _1_23,       # Phantom 4
    "fc6310": _ONE,       # Phantom 4 Pro (1" sensor)
    "fc6310s": _ONE,
    "fc220": _1_23,       # Mavic Pro
    "fc2103": _1_23,      # Mavic Air
    "fc2204": _ONE,       # Mavic 2 Pro (Hasselblad L1D-20c partner)
    "fc2220": _1_23,      # Mavic 2 Zoom
    "fc3170": _1_23,      # Mavic Air 2
    "fc3411": _ONE,       # Air 2S
    "fc3582": _ONE,       # Mini 3 Pro (1/1.3" ~ 9.6, approx)
    "fc7303": _1_23,      # Mini 2
    "zenmuse x3": _1_23,
    "zenmuse x5": _FT,
    "zenmuse x5s": _FT,
    "zenmuse x7": _APSC,
})
_BUILTIN["hasselblad l1d-20c"] = _ONE

_add("apple", {
    "iphone 4": 4.54, "iphone 4s": 4.54, "iphone 5": 4.54, "iphone 5c": 4.54,
    "iphone 5s": 4.8, "iphone 6": 4.8, "iphone 6 plus": 4.8,
    "iphone 6s": 4.8, "iphone 6s plus": 4.8, "iphone se": 4.8,
    "iphone 7": 4.8, "iphone 7 plus": 4.8, "iphone 8": 4.8,
    "iphone 8 plus": 4.8, "iphone x": 5.6, "iphone xr": 5.6,
    "iphone xs": 5.6, "iphone xs max": 5.6, "iphone 11": 5.6,
    "iphone 11 pro": 5.6, "iphone 11 pro max": 5.6, "iphone 12": 5.7,
    "iphone 12 mini": 5.7, "iphone 12 pro": 5.7, "iphone 12 pro max": 5.7,
    "iphone 13": 7.0, "iphone 13 mini": 7.0, "iphone 13 pro": 7.0,
    "iphone 13 pro max": 7.0, "iphone 14": 7.0, "iphone 14 pro": 9.8,
    "iphone 15": 9.8, "iphone 15 pro": 9.8,
})

_add("samsung", {
    "galaxy s6": 5.9, "galaxy s7": 5.9, "galaxy s8": 6.3, "galaxy s9": 6.3,
    "galaxy s10": 6.3, "galaxy s20": 7.0, "galaxy s21": 7.0,
    "galaxy s22": 7.0, "galaxy note 8": 6.3, "galaxy note 9": 6.3,
    "galaxy note 10": 6.3, "sm-g930f": 5.9, "sm-g950f": 6.3,
    "sm-g960f": 6.3, "sm-g973f": 6.3, "sm-g981b": 7.0,
})

_add("google", {
    "pixel": 6.2, "pixel 2": 6.2, "pixel 3": 5.9, "pixel 3a": 5.9,
    "pixel 4": 5.9, "pixel 4a": 5.9, "pixel 5": 5.9, "pixel 6": 8.2,
    "pixel 6 pro": 8.2, "pixel 7": 8.2, "pixel 7 pro": 8.2,
})

_add("huawei", {
    "p20": 6.3, "p20 pro": 8.0, "p30": 6.3, "p30 pro": 6.3, "mate 20": 6.3,
    "mate 20 pro": 6.3, "eml-l09": 6.3, "vog-l09": 6.3, "clt-l09": 8.0,
})

_add("garmin", {"virb": _1_23, "virb ultra 30": _1_23, "virb 360": _1_23})
_add("kodak", {"pixpro sp360": _1_23, "pixpro sp360 4k": _1_23})
_add("xiaomi", {"mi 9": 6.4, "mi 10": 8.5, "yi action camera": _1_23})
_add("insta360", {"one x": _1_23, "one x2": _1_23, "one r": _1_23})
_add("parrot", {"anafi": 5.9, "bebop 2": _1_23, "sequoia": 4.8})
_add("sensefly", {"s.o.d.a.": _ONE})

_extra: Dict[str, float] = {}
_loaded_paths = set()


def load_extra_sensor_data(path: str) -> int:
    """Merge a user {"make model": width_mm} JSON file; returns #entries."""
    if not path or path in _loaded_paths or not os.path.isfile(path):
        return 0
    try:
        with open(path) as f:
            entries = json.load(f)
    except (OSError, ValueError) as e:
        logger.warning("Could not read sensor data %s: %s", path, e)
        return 0
    count = 0
    for key, width in entries.items():
        try:
            _extra[str(key).strip().lower()] = float(width)
            count += 1
        except (TypeError, ValueError):
            continue
    _loaded_paths.add(path)
    logger.info("Loaded %d sensor widths from %s", count, path)
    return count


_env_path = os.environ.get("OPENSFM_TPU_SENSOR_DATA")
if _env_path:
    load_extra_sensor_data(_env_path)


def sensor_data() -> Dict[str, float]:
    """Combined sensor-width table (user entries override built-ins)."""
    if _extra:
        merged = dict(_BUILTIN)
        merged.update(_extra)
        return merged
    return _BUILTIN


def sensor_width(sensor_string: Optional[str]) -> Optional[float]:
    """Width in mm for a `sensor_string(make, model)` key, or None."""
    if not sensor_string:
        return None
    return sensor_data().get(sensor_string)
