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


# Representative desktop/mobile User-Agent strings per browser family
# (HeaderSampler.java draws from user-agents/* resources; a few
# exemplars per family keep the distribution realistic without
# shipping the full lists)
UA_BY_BROWSER = {
    "chrome": [
        "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36",
        "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/119.0.0.0 Safari/537.36",
        "Mozilla/5.0 (X11; Linux x86_64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/118.0.0.0 Safari/537.36",
    ],
    "firefox": [
        "Mozilla/5.0 (Windows NT 10.0; Win64; x64; rv:121.0) Gecko/20100101 Firefox/121.0",
        "Mozilla/5.0 (Macintosh; Intel Mac OS X 10.15; rv:120.0) Gecko/20100101 Firefox/120.0",
        "Mozilla/5.0 (X11; Ubuntu; Linux x86_64; rv:119.0) Gecko/20100101 Firefox/119.0",
    ],
    "ie": [
        "Mozilla/5.0 (Windows NT 6.1; WOW64; Trident/7.0; rv:11.0) like Gecko",
        "Mozilla/4.0 (compatible; MSIE 8.0; Windows NT 6.0; Trident/4.0)",
    ],
    "mobile": [
        "Mozilla/5.0 (iPhone; CPU iPhone OS 17_1 like Mac OS X) AppleWebKit/605.1.15 (KHTML, like Gecko) Version/17.1 Mobile/15E148 Safari/604.1",
        "Mozilla/5.0 (Linux; Android 14; Pixel 8) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.0.0 Mobile Safari/537.36",
    ],
    "opera": [
        "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/119.0.0.0 Safari/537.36 OPR/105.0.0.0",
        "Opera/9.80 (Windows NT 6.1; WOW64) Presto/2.12.388 Version/12.18",
    ],
    "safari": [
        "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/605.1.15 (KHTML, like Gecko) Version/17.1 Safari/605.1.15",
        "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_14_6) AppleWebKit/605.1.15 (KHTML, like Gecko) Version/14.1.2 Safari/605.1.15",
    ],
}
# HeaderSampler's BrowserSampler weights (browser → share)
HEADER_BROWSER_WEIGHTS = [("chrome", 50), ("firefox", 18), ("safari", 15),
                          ("mobile", 10), ("ie", 5), ("opera", 2)]


# Fortune-500 company domains (public list; mirrors the reference's
# f500-domains.csv resource used by DnsSampler's head distribution)
F500_DOMAINS = [
    "21cf.com", "3m.com", "53.com", "aa.com", "abbott.com",
    "abbvie.com", "abc.xyz", "abm.com", "aboutmcdonalds.com", "aboutschwab.com",
    "adm.com", "adp.com", "advanceautoparts.com", "aecom.com", "aep.com",
    "aes.com", "aetna.com", "afginc.com", "aflac.com", "agcocorp.com",
    "aig.com", "airgas.com", "airproducts.com", "ajg.com", "aksteel.com",
    "alaskaair.com", "alcoa.com", "alliancedata.com", "allstate.com", "ally.com",
    "altria.com", "amark.com", "amazon.com", "ameren.com", "americanexpress.com",
    "ameriprise.com", "amerisourcebergen.com", "amfam.com", "amgen.com", "amphenol.com",
    "anadarko.com", "anixter.com", "antheminc.com", "apachecorp.com", "apple.com",
    "appliedmaterials.com", "aramark.com", "arrow.com", "asburyauto.com", "ashland.com",
    "assurant.com", "att.com", "auto-owners.com", "autoliv.com", "autonation.com",
    "autozone.com", "averydennison.com", "avisbudgetgroup.com", "avnet.com", "avoncompany.com",
    "bakerhughes.com", "ball.com", "bankofamerica.com", "barnesandnobleinc.com", "baxalta.com",
    "baxter.com", "bbt.com", "bd.com", "bedbathandbeyond.com", "berkshirehathaway.com",
    "bestbuy.com", "biglots.com", "biogen.com", "blackrock.com", "bms.com",
    "bnymellon.com", "boeing.com", "boozallen.com", "borgwarner.com", "bostonscientific.com",
    "broadcom.com", "burlingtonstores.com", "c-a-m.com", "cablevision.com", "calpine.com",
    "campbellsoupcompany.com", "capitalone.com", "cardinal.com", "carmax.com", "caseys.com",
    "caterpillar.com", "cbrands.com", "cbre.com", "cbscorporation.com", "cdw.com",
    "celanese.com", "celgene.com", "centene.com", "centerpointenergy.com", "centurylink.com",
    "ch2m.com", "charter.com", "chevron.com", "chk.com", "chrobinson.com",
    "chs.net", "chsinc.com", "cigna.com", "cinfin.com", "cisco.com",
    "citigroup.com", "citizensbank.com", "cmc.com", "cmsenergy.com", "coca-colacompany.com",
    "cognizant.com", "cokecce.com", "colgatepalmolive.com", "comcastcorporation.com", "conagrafoods.com",
    "conedison.com", "conocophillips.com", "core-mark.com", "corning.com", "corporate.murphyusa.com",
    "costco.com", "crowncork.com", "csc.com", "cstbrands.com", "csx.com",
    "cummins.com", "cvshealth.com", "dana.com", "danaher.com", "darden.com",
    "davita.com", "deanfoods.com", "delekus.com", "delta.com", "devonenergy.com",
    "dickssportinggoods.com", "dillards.com", "discoverfinancial.com", "discoverycommunications.com", "dish.com",
    "disney.com", "dollargeneral.com", "dollartree.com", "dom.com", "domtar.com",
    "dovercorporation.com", "dow.com", "drhorton.com", "drpeppersnapplegroup.com", "dteenergy.com",
    "duke-energy.com", "dupont.com", "eastman.com", "ebay.com", "ecolab.com",
    "edisoninvestor.com", "edwardjones.com", "elcompanies.com", "emc.com", "emcorgroup.com",
    "emerson.com", "energyfutureholdings.com", "energytransfer.com", "entergy.com", "enterpriseproducts.com",
    "eogresources.com", "erieinsurance.com", "essendant.com", "eversource.com", "evhc.net",
    "exeloncorp.com", "expediainc.com", "expeditors.com", "express-scripts.com", "exxonmobil.com",
    "facebook.com", "fanniemae.com", "farmers.com", "fcx.com", "fedex.com",
    "firstam.com", "firstdata.com", "firstenergycorp.com", "fiserv.com", "fisglobal.com",
    "fluor.com", "fmctechnologies.com", "fnf.com", "footlocker-inc.com", "ford.com",
    "franklinresources.com", "freddiemac.com", "frontier.com", "gamestopcorp.com", "gapinc.com",
    "ge.com", "generaldynamics.com", "generalmills.com", "genesishcc.com", "genpt.com",
    "genworth.com", "gilead.com", "globalp.com", "gm.com", "goodyear.com",
    "grainger.com", "graybar.com", "group1auto.com", "gs.com", "guardianlife.com",
    "halliburton.com", "hanes.com", "harley-davidson.com", "harman.com", "hcahealthcare.com",
    "hdsupply.com", "healthnet.com", "henryschein.com", "hertz.com", "hess.com",
    "hiltonworldwide.com", "hollyfrontier.com", "homedepot.com", "honeywell.com", "hormelfoods.com",
    "hosthotels.com", "hp.com", "hrggroup.com", "humana.com", "huntingtoningalls.com",
    "huntsman.com", "ibm.com", "ielp.com", "iheartmedia.com", "ingrammicro.com",
    "ingredion.com", "insight.com", "intel.com", "internationalpaper.com", "interpublic.com",
    "intlfcstone.com", "itw.com", "jabil.com", "jacobs.com", "jarden.com",
    "jbhunt.com", "jcpenney.com", "jetblue.com", "jll.com", "jmsmucker.com",
    "jnj.com", "johndeere.com", "johnsoncontrols.com", "jpmorganchase.com", "kelloggcompany.com",
    "kellyservices.com", "kiewit.com", "kimberly-clark.com", "kindermorgan.com", "kindredhealthcare.com",
    "kkr.com", "kohlscorporation.com", "kraftheinzcompany.com", "l-3com.com", "labcorp.com",
    "lamresearch.com", "landolakesinc.com", "lansingtradegroup.com", "lb.com", "lear.com",
    "lennar.com", "leucadia.com", "level3.com", "lfg.com", "libertyinteractive.com",
    "libertymutual.com", "lifepointhealth.net", "lilly.com", "lithia.com", "livenation.com",
    "lkqcorp.com", "lockheedmartin.com", "loews.com", "lowes.com", "macysinc.com",
    "manpowergroup.com", "marathonoil.com", "marathonpetroleum.com", "markelcorp.com", "marriott.com",
    "masco.com", "massmutual.com", "mastercard.com", "mattel.com", "mckesson.com",
    "merck.com", "metlife.com", "mgmresorts.com", "micron.com", "microsoft.com",
    "mmc.com", "mohawkind.com", "molinahealthcare.com", "mondelezinternational.com", "monsanto.com",
    "morganstanley.com", "mosaicco.com", "motorolasolutions.com", "mutualofomaha.com", "nationwide.com",
    "navient.com", "navistar.com", "ncr.com", "netapp.com", "netflix.com",
    "newellbrands.com", "newmont.com", "newscorp.com", "newyorklife.com", "nexteraenergy.com",
    "nglenergypartners.com", "nike.com", "nisource.com", "nordstrom.com", "northropgrumman.com",
    "northwesternmutual.com", "nov.com", "nrgenergy.com", "nscorp.com", "nucor.com",
    "nvrinc.com", "o-i.com", "officedepot.com", "oldrepublic.com", "omnicomgroup.com",
    "oneok.com", "oracle.com", "oreillyauto.com", "oshkoshcorporation.com", "owens-minor.com",
    "owenscorning.com", "oxy.com", "paccar.com", "pacificlife.com", "packagingcorp.com",
    "parker.com", "paypal.com", "pbfenergy.com", "peabodyenergy.com", "penskeautomotive.com",
    "pepsico.com", "pfgc.com", "pfizer.com", "pg.com", "pge.com",
    "phillips66.com", "plainsallamerican.com", "pmi.com", "pnc.com", "ppg.com",
    "pplweb.com", "praxair.com", "precast.com", "pricelinegroup.com", "principal.com",
    "progressive.com", "prudential.com", "pseg.com", "publix.com", "pultegroupinc.com",
    "pvh.com", "qualcomm.com", "quantaservices.com", "questdiagnostics.com", "quintiles.com",
    "ralphlauren.com", "raymondjames.com", "raytheon.com", "realogy.com", "regions.com",
    "republicservices.com", "reynoldsamerican.com", "rgare.com", "riteaid.com", "rockwellautomation.com",
    "rockwellcollins.com", "rossstores.com", "rrdonnelley.com", "rsac.com", "ryder.com",
    "salesforce.com", "sandisk.com", "sands.com", "sanmina.com", "seaboardcorp.com",
    "sealedair.com", "searsholdings.com", "sempra.com", "sherwin.com", "simon.com",
    "sjm.com", "sonicautomotive.com", "southerncompany.com", "southwest.com", "spartannash.com",
    "spectraenergy.com", "spglobal.com", "spiritaero.com", "stanleyblackanddecker.com", "staples.com",
    "starbucks.com", "starwoodhotels.com", "statefarm.com", "statestreet.com", "steeldynamics.com",
    "stryker.com", "suntrust.com", "supervalu.com", "symantec.com", "synnex.com",
    "sysco.com", "ta-petrol.com", "targaresources.com", "target.com", "tdsinc.com",
    "techdata.com", "tenethealth.com", "tenneco.com", "terex.com", "textron.com",
    "thecloroxcompany.com", "thehartford.com", "thehersheycompany.com", "thekrogerco.com", "thermofisher.com",
    "thrivent.com", "ti.com", "tiaa.org", "timewarner.com", "tjx.com",
    "toysrusinc.com", "tractorsupply.com", "travelers.com", "trin.net", "tsocorp.com",
    "twc.com", "tysonfoods.com", "ugicorp.com", "uhsinc.com", "unfi.com",
    "unitedcontinentalholdings.com", "unitedhealthgroup.com", "unitedrentals.com", "univar.com", "unum.com",
    "up.com", "ups.com", "usaa.com", "usbank.com", "usfoods.com",
    "ussteel.com", "utc.com", "valero.com", "veritivcorp.com", "verizon.com",
    "vfc.com", "viacom.com", "visa.com", "visteon.com", "voya.com",
    "walgreensbootsalliance.com", "walmart.com", "wecenergygroup.com", "wellcare.com", "wellsfargo.com",
    "wesco.com", "westerndigital.com", "westernsouthern.com", "westernunion.com", "westrock.com",
    "weyerhaeuser.com", "wfscorp.com", "whirlpoolcorp.com", "wholefoodsmarket.com", "williams.com",
    "windstream.com", "wm.com", "wnr.com", "wrberkley.com", "wyndhamworldwide.com",
    "xcelenergy.com", "xerox.com", "xpo.com", "yum.com", "zimmerbiomet.com",
]
