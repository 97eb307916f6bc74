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


# SSA area-number allocation table (public SSA data; mirrors the
# reference's ssn-seeds resource: (start, end, state, type, description))
SSN_RANGES = [
    (0, 0, "--", "unused", ""),
    (1, 3, "NH", "normal", "New Hampshire"),
    (4, 7, "ME", "normal", "Maine"),
    (8, 9, "VT", "normal", "Vermont"),
    (10, 34, "MA", "normal", "Massachusetts"),
    (35, 39, "RI", "normal", "Rhode Island"),
    (40, 49, "CT", "normal", "Connecticutt"),
    (50, 134, "NY", "normal", "New York"),
    (135, 158, "NJ", "normal", "New Jersey"),
    (159, 211, "PA", "normal", "Pennsylvania"),
    (212, 220, "MD", "normal", "Maryland"),
    (221, 222, "DE", "normal", "Delaware"),
    (223, 231, "VA", "normal", "Virginia"),
    (232, 236, "WV", "normal", "West Virginia"),
    (237, 246, "NC", "normal", "North Carolina"),
    (247, 251, "SC", "normal", "South Carolina"),
    (252, 260, "GA", "normal", "Georgia"),
    (261, 267, "FL", "normal", "Florida"),
    (268, 302, "OH", "normal", "Ohio"),
    (303, 317, "IN", "normal", "Indiana"),
    (318, 361, "IL", "normal", "Illinois"),
    (362, 386, "MI", "normal", "Michigan"),
    (387, 399, "WI", "normal", "Wisconsin"),
    (400, 407, "KY", "normal", "Kentucky"),
    (408, 415, "TN", "normal", "Tennessee"),
    (416, 424, "AL", "normal", "Alabama"),
    (425, 428, "MS", "normal", "Mississippi"),
    (429, 432, "AR", "normal", "Arkansas"),
    (433, 439, "LA", "normal", "Louisiana"),
    (440, 448, "OK", "normal", "Oklahoma"),
    (449, 467, "TX", "normal", "Texas"),
    (468, 477, "MN", "normal", "Minnesota"),
    (478, 485, "IA", "normal", "Iowa"),
    (486, 500, "MO", "normal", "Missouri"),
    (501, 502, "ND", "normal", "North Dakota"),
    (503, 504, "SD", "normal", "South Dakota"),
    (505, 508, "NE", "normal", "Nebraska"),
    (509, 515, "KS", "normal", "Kansas"),
    (516, 517, "MT", "normal", "Montana"),
    (518, 519, "ID", "normal", "Idaho"),
    (520, 520, "WY", "normal", "Wyoming"),
    (521, 524, "CO", "normal", "Colorado"),
    (525, 525, "NM", "normal", "New Mexico"),
    (526, 527, "AZ", "normal", "Arizona"),
    (528, 529, "UT", "normal", "Utah"),
    (530, 530, "NV", "normal", "Nevada"),
    (531, 539, "WA", "normal", "Washington"),
    (540, 544, "OR", "normal", "Oregon"),
    (545, 573, "CA", "normal", "California"),
    (574, 574, "AK", "normal", "Alaska"),
    (575, 576, "HI", "normal", "Hawaii"),
    (577, 579, "DC", "normal", "District of Columbia"),
    (580, 580, "VI", "extra", "Virgin Islands"),
    (581, 584, "PR", "normal", "Puerto Rico"),
    (585, 585, "NM", "normal", "New Mexico"),
    (586, 586, "PI", "extra", "Pacific Islands: Guam/American Samoa/Philippines"),
    (587, 588, "MS", "normal", "Mississippi"),
    (589, 595, "FL", "normal", "Florida"),
    (596, 599, "PR", "normal", "Puerto Rico"),
    (600, 601, "AZ", "normal", "Arizona"),
    (602, 626, "CA", "normal", "California"),
]
