"""Deterministic synthetic vocabularies.

log-synth ships real-world resource files (names, streets, zips) inside
its jar; the reference samplers read them via ``Resources.getResource``
(e.g. ``samplers/StringSampler.java``, ``samplers/ZipSampler.java``).
We keep this repo self-contained: vocabularies are *generated* here
from syllable grammars at import time (pure python, no RNG state — the
lists are a deterministic function of the grammar), except small
public-fact lists (US state abbreviations, country names) which are
spelled out.  Shapes and cardinalities mirror the reference's usage.
"""

from __future__ import annotations

# ---------------------------------------------------------------- names
_ON = ["b", "br", "c", "ch", "d", "f", "g", "gr", "h", "j", "k", "l",
       "m", "n", "p", "r", "s", "sh", "t", "th", "v", "w", "z"]
_NUC = ["a", "e", "i", "o", "u", "ai", "ea", "ia", "io"]
_COD = ["", "n", "r", "s", "l", "m", "t", "nd", "ck"]


def _syllables(max_n: int) -> list[str]:
    out = []
    for o in _ON:
        for n in _NUC:
            for c in _COD:
                out.append(o + n + c)
                if len(out) >= max_n:
                    return out
    return out


_SYL = _syllables(1200)

FIRST_NAMES = [(_SYL[i] + _SYL[(i * 7 + 3) % 600]).capitalize() for i in range(600)]
LAST_NAMES = [(_SYL[(i * 11 + 5) % 1000] + _SYL[(i * 13 + 1) % 800] +
               ("son" if i % 5 == 0 else "")).capitalize() for i in range(800)]
WORDS = sorted({_SYL[i % 1200] + _SYL[(i * 17 + 7) % 1100] for i in range(2400)})

STREET_NAMES = [(_SYL[(i * 19 + 2) % 900]).capitalize() + w
                for i, w in enumerate(
                    ["wood", "field", "brook", "hill", "lake", "view", "ridge",
                     "stone", "creek", "grove"] * 40)]
STREET_SUFFIXES = ["St", "Ave", "Blvd", "Ct", "Dr", "Ln", "Pl", "Rd", "Ter", "Way"]

CITIES = [(_SYL[(i * 23 + 9) % 1100] + s).capitalize()
          for i, s in enumerate(["ville", "ton", "burg", "field", "port",
                                 "ford", "haven", "dale", "mont", "polis"] * 30)]

# public facts, not copied resources
STATES = ["AL", "AK", "AZ", "AR", "CA", "CO", "CT", "DE", "FL", "GA", "HI",
          "ID", "IL", "IN", "IA", "KS", "KY", "LA", "ME", "MD", "MA", "MI",
          "MN", "MS", "MO", "MT", "NE", "NV", "NH", "NJ", "NM", "NY", "NC",
          "ND", "OH", "OK", "OR", "PA", "RI", "SC", "SD", "TN", "TX", "UT",
          "VT", "VA", "WA", "WV", "WI", "WY"]
CONTINENTAL_STATES = [s for s in STATES if s not in ("AK", "HI")]

COUNTRIES = ["United States", "Canada", "Mexico", "Brazil", "Argentina",
             "United Kingdom", "France", "Germany", "Spain", "Italy",
             "Netherlands", "Belgium", "Sweden", "Norway", "Denmark",
             "Finland", "Poland", "Austria", "Switzerland", "Portugal",
             "Ireland", "Greece", "Turkey", "Russia", "Ukraine", "China",
             "Japan", "South Korea", "India", "Indonesia", "Thailand",
             "Vietnam", "Philippines", "Malaysia", "Singapore", "Australia",
             "New Zealand", "South Africa", "Egypt", "Nigeria", "Kenya",
             "Morocco", "Israel", "Saudi Arabia", "United Arab Emirates",
             "Chile", "Colombia", "Peru", "Venezuela", "Ecuador"]

LANGUAGES = ["en", "es", "fr", "de", "it", "pt", "nl", "sv", "no", "da",
             "fi", "pl", "ru", "uk", "zh", "ja", "ko", "hi", "id", "th",
             "vi", "tl", "ms", "ar", "he", "tr", "el"]

TLDS = ["com", "net", "org", "io", "co", "info", "biz", "us", "app", "dev"]

BROWSERS = ["Chrome", "Safari", "Firefox", "Edge", "Opera", "IE", "Brave"]
BROWSER_WEIGHTS = [0.60, 0.18, 0.08, 0.08, 0.03, 0.02, 0.01]

OSES = ["Windows", "macOS", "Linux", "Android", "iOS", "ChromeOS"]
OS_WEIGHTS = [0.40, 0.18, 0.05, 0.22, 0.13, 0.02]

USER_AGENT_BITS = ["Mozilla/5.0", "AppleWebKit/537.36", "Gecko/20100101",
                   "Chrome/120.0", "Safari/605.1", "Firefox/121.0"]

MKTSEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]

# ------------------------------------------------------------------ zips
# synthetic zip database: (zip5, city, state, lat, lon) — continental
# lat 25..49, lon -124..-67, deterministic spread
ZIP_ROWS = []
for k in range(1000):
    z5 = f"{(k * 97 + 10001) % 100000:05d}"
    city = CITIES[k % len(CITIES)]
    state = CONTINENTAL_STATES[k % len(CONTINENTAL_STATES)]
    lat = round(25.0 + (k * 37 % 1000) / 1000.0 * 24.0, 6)
    lon = round(-124.0 + (k * 61 % 1000) / 1000.0 * 57.0, 6)
    ZIP_ROWS.append((z5, city, state, lat, lon))

ZIP_CODES = [r[0] for r in ZIP_ROWS]
ZIP_CITIES = [r[1] for r in ZIP_ROWS]
ZIP_STATES = [r[2] for r in ZIP_ROWS]
ZIP_LATS = [r[3] for r in ZIP_ROWS]
ZIP_LONS = [r[4] for r in ZIP_ROWS]
