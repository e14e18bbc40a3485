"""Deterministic tiny TPC-DS dataset generator — turns the 103-query
corpus battery from "plans and executes on empty tables" into
"ORACLE-VERIFIED against DuckDB on real rows".

Not dsdgen and not claiming to be: a seeded, spec-shaped generator that
covers the PUBLIC TPC-DS domains the query predicates bind to (calendar
1998-2003 with real d_month_seq/d_week_seq arithmetic, the ten item
categories, real state/county/gmt-offset/buy-potential/education/
marital domains, ship-mode types, meal times), with referentially
consistent facts (every FK resolves; returns reference real sale line
items by order/ticket + item; multi-line orders share order numbers
and can span warehouses). Money columns are decimal(7,2) end-to-end so
SUM aggregates are bit-exact in BOTH engines; only AVG-type outputs go
through float (DuckDB returns double) and are compared numerically.

Every value derives from random.Random(table-specific seed): the same
bytes on every machine, every run — the parquet cache key is the
generator VERSION below, so editing the generator invalidates the cache.

Scale knob: N_* constants. Defaults land ~100k fact rows total — big
enough that most of the 103 queries return non-empty results, small
enough that the full Spark-vs-DuckDB sweep runs in minutes.
"""

from __future__ import annotations

import datetime as dt
import os
import random
from decimal import Decimal

VERSION = 3  # bump to invalidate cached parquet (v3: coverage injections)

N_ITEM = 400
N_CUSTOMER = 600
N_ADDRESS = 500
N_STORE = 12
N_WAREHOUSE = 5
N_WEB_SITE = 8
N_WEB_PAGE = 24
N_CALL_CENTER = 4
N_CATALOG_PAGE = 40
N_PROMO = 30
N_STORE_ORDERS = 16_000   # ~1.9 line items per order
N_CATALOG_ORDERS = 8_000
N_WEB_ORDERS = 8_000

D0 = dt.date(1998, 1, 1)
D1 = dt.date(2003, 12, 31)
JULIAN_D0 = 2_450_815  # dsdgen's d_date_sk for 1998-01-01

CATEGORIES = ["Books", "Children", "Electronics", "Home", "Jewelry",
              "Men", "Music", "Shoes", "Sports", "Women"]
CLASSES = {  # three real classes per category (public spec domains)
    "Books": ["business", "computers", "history"],
    "Children": ["infants", "newborn", "toddlers"],
    "Electronics": ["audio", "cameras", "televisions"],
    "Home": ["bathroom", "bedding", "kitchen"],
    "Jewelry": ["birdal", "diamonds", "gold"],
    "Men": ["accessories", "pants", "shirts"],
    "Music": ["classical", "country", "pop"],
    "Shoes": ["athletic", "kids", "mens"],
    "Sports": ["baseball", "camping", "fitness"],
    "Women": ["dresses", "fragrances", "maternity"],
}
STATES = ["TN", "GA", "AL", "SC", "NC", "KY", "VA", "FL", "MS", "LA",
          "TX", "OH", "IN", "IL", "MI", "IA", "KS", "MN", "MO", "NE"]
COUNTIES = ["Williamson County", "Walker County", "Ziebach County",
            "Storey County", "Rush County", "Daviess County",
            "Franklin Parish", "Luce County", "Richland County",
            "Barrow County", "Bronx County", "Orange County",
            "Mobile County", "Maverick County", "Mesa County",
            "Raleigh County", "Fairfield County", "Jackson County",
            "Oglethorpe County", "Huron County"]
CITIES = ["Fairview", "Midway", "Oak Grove", "Pleasant Hill", "Centerville",
          "Riverside", "Five Points", "Oakland", "Union", "Salem"]
STREET_TYPES = ["Street", "Ave", "Blvd", "Ct", "Dr", "Ln", "Pkwy", "Rd", "Way"]
STREET_NAMES = ["Main", "Oak", "Park", "First", "Second", "Cedar", "Elm",
                "Lake", "Hill", "College"]
BUY_POTENTIAL = [">10000", "5001-10000", "1001-5000", "501-1000",
                 "0-500", "Unknown"]
EDUCATION = ["Primary", "Secondary", "College", "2 yr Degree",
             "4 yr Degree", "Advanced Degree", "Unknown"]
MARITAL = ["S", "M", "D", "W", "U"]
CREDIT = ["Low Risk", "Good", "High Risk", "Unknown"]
SHIP_TYPES = ["EXPRESS", "NEXT DAY", "OVERNIGHT", "REGULAR", "TWO DAY",
              "LIBRARY"]
CARRIERS = ["UPS", "FEDEX", "AIRBORNE", "USPS", "DHL", "TBS", "ZHOU",
            "LATVIAN", "ALLIANCE", "GERMA"]
MEALS = ["breakfast", "lunch", "dinner", ""]
GMT = [Decimal("-5.00"), Decimal("-6.00"), Decimal("-7.00"), Decimal("-8.00")]
FIRST = ["James", "Mary", "John", "Linda", "Robert", "Susan", "Michael",
         "Karen", "William", "Lisa", "David", "Nancy", "Richard", "Betty"]
LAST = ["Smith", "Johnson", "Brown", "Jones", "Miller", "Davis", "Wilson",
        "Moore", "Taylor", "White", "Clark", "Hall", "Young", "King"]


def _dec(rng: random.Random, lo: float, hi: float) -> Decimal:
    return Decimal(rng.randrange(int(lo * 100), int(hi * 100))) / 100


def _id(prefix: str, sk: int) -> str:
    return f"{prefix}{sk:012d}"[:16]


def _date_dim():
    rows = []
    day = D0
    names = ["Monday", "Tuesday", "Wednesday", "Thursday", "Friday",
             "Saturday", "Sunday"]
    while day <= D1:
        off = (day - D0).days
        moy, dom, year = day.month, day.day, day.year
        qoy = (moy - 1) // 3 + 1
        dow = day.weekday()  # 0=Mon
        first_dom = JULIAN_D0 + (day.replace(day=1) - D0).days
        nxt = (day.replace(day=28) + dt.timedelta(days=4)).replace(day=1)
        last_dom = JULIAN_D0 + (nxt - dt.timedelta(days=1) - D0).days
        rows.append((
            JULIAN_D0 + off, _id("D", off), day,
            (year - 1900) * 12 + (moy - 1),                     # d_month_seq
            (day - dt.date(1900, 1, 1)).days // 7 + 1,          # d_week_seq
            (year - 1900) * 4 + (qoy - 1),                      # d_quarter_seq
            year, (dow + 1) % 7, moy, dom, qoy,
            year, (year - 1900) * 4 + (qoy - 1),
            (day - dt.date(1900, 1, 1)).days // 7 + 1,
            names[dow], f"{year}Q{qoy}",
            "Y" if (moy, dom) in ((1, 1), (7, 4), (12, 25)) else "N",
            "Y" if dow >= 5 else "N",
            "N", first_dom, last_dom,
            JULIAN_D0 + max(0, off - 365), JULIAN_D0 + max(0, off - 91),
            "N", "N", "N", "N", "N",
        ))
        day += dt.timedelta(days=1)
    return rows


def _time_dim():
    rows = []
    for i in range(1440):  # one row per minute of the day
        h, m = divmod(i, 60)
        t = i * 60
        shift = "first" if h < 8 else ("second" if h < 16 else "third")
        sub = ["morning", "afternoon", "evening", "night"][h // 6]
        meal = ("breakfast" if 6 <= h < 9 else
                "lunch" if 11 <= h < 14 else
                "dinner" if 17 <= h < 21 else "")
        rows.append((t, _id("T", i), t, h, m, 0,
                     "AM" if h < 12 else "PM", shift, sub, meal))
    return rows


def _items(rng):
    rows = []
    sizes = ["small", "medium", "large", "extra large", "economy", "N/A",
             "petite"]
    colors = ["red", "blue", "green", "yellow", "black", "white", "navy",
              "khaki", "salmon", "plum", "powder", "puff", "orchid", "peach"]
    units = ["Each", "Dozen", "Case", "Pound", "Box", "Bundle"]
    containers = ["Unknown"]
    for sk in range(1, N_ITEM + 1):
        cat_i = (sk - 1) % 10
        cat = CATEGORIES[cat_i]
        cls_i = (sk // 10) % 3
        brand_i = (sk * 7) % 10 + 1
        manu = (sk * 13) % 1000 + 1
        rows.append((
            sk, _id("I", sk), D0, None,
            f"item description {sk} " + "x" * (sk % 17),
            _dec(rng, 0.5, 99.0), _dec(rng, 0.3, 60.0),
            brand_i * 1000 + cat_i + 1, f"brand{brand_i}#{cat_i + 1}",
            cls_i + 1, CLASSES[cat][cls_i], cat_i + 1, cat,
            manu, f"manufact{manu}", rng.choice(sizes), "formulation",
            rng.choice(colors), rng.choice(units), containers[0],
            (sk * 3) % 100 + 1, f"product{sk}",
        ))
    return rows


def _addresses(rng):
    rows = []
    for sk in range(1, N_ADDRESS + 1):
        rows.append((
            sk, _id("A", sk), str(rng.randrange(1, 999)),
            rng.choice(STREET_NAMES), rng.choice(STREET_TYPES),
            f"Suite {rng.randrange(0, 99) * 10}",
            CITIES[sk % len(CITIES)], COUNTIES[sk % len(COUNTIES)],
            STATES[sk % len(STATES)],
            f"{rng.randrange(10000, 99999)}", "United States",
            GMT[sk % len(GMT)], rng.choice(["apartment", "condo", "single family"]),
        ))
    return rows


def _cdemo():
    rows = []
    sk = 0
    for g in "MF":
        for m in MARITAL:
            for e in EDUCATION:
                for cr in CREDIT:
                    sk += 1
                    rows.append((sk, g, m, e, (sk % 20) * 500 + 500, cr,
                                 sk % 7, sk % 5, sk % 7))
    return rows


def _hdemo():
    rows = []
    for sk in range(1, 101):
        rows.append((sk, (sk - 1) % 20 + 1, BUY_POTENTIAL[sk % 6],
                     sk % 10, sk % 6 - 1))
    return rows


def _customers(rng, n_cdemo):
    rows = []
    for sk in range(1, N_CUSTOMER + 1):
        rows.append((
            sk, _id("C", sk), rng.randrange(1, n_cdemo + 1),
            rng.randrange(1, 101), rng.randrange(1, N_ADDRESS + 1),
            JULIAN_D0 + rng.randrange(0, 360), JULIAN_D0 + rng.randrange(0, 360),
            rng.choice(["Mr.", "Mrs.", "Ms.", "Dr."]),
            FIRST[sk % len(FIRST)], LAST[(sk * 3) % len(LAST)],
            "Y" if sk % 2 else "N", sk % 28 + 1, sk % 12 + 1,
            1990 - sk % 60, "United States", None,
            f"c{sk}@example.org", JULIAN_D0 + 2000,
        ))
    return rows


def _stores(rng):
    rows = []
    names = ["ought", "able", "pri", "ese", "anti", "cally", "ation",
             "eing", "n st", "bar", "ought", "able"]
    for sk in range(1, N_STORE + 1):
        # unique s_store_id (dsdgen reuses ids across SCD versions, but a
        # duplicate id makes ORDER BY keys non-unique → LIMIT-boundary tie
        # sets legitimately differ between engines; see test_tpcds_oracle)
        rows.append((
            sk, _id("S", sk), D0, None, None, names[sk - 1],
            200 + sk * 8, 5_000_000 + sk * 100_000, "8AM-8PM",
            FIRST[sk % len(FIRST)] + " " + LAST[sk % len(LAST)],
            sk % 10 + 1, "Unknown", f"market desc {sk}",
            FIRST[(sk + 3) % len(FIRST)] + " " + LAST[(sk + 5) % len(LAST)],
            sk % 3 + 1, "Unknown", sk % 2 + 1, "Unknown",
            str(100 + sk), rng.choice(STREET_NAMES), rng.choice(STREET_TYPES),
            f"Suite {sk * 10}", CITIES[sk % len(CITIES)],
            COUNTIES[sk % len(COUNTIES)], STATES[sk % 6],  # store states: first 6
            f"{38000 + sk}", "United States", GMT[sk % 2],
            _dec(rng, 0.0, 0.11),
        ))
    return rows


def _warehouses(rng):
    rows = []
    for sk in range(1, N_WAREHOUSE + 1):
        rows.append((
            sk, _id("W", sk), f"Warehouse number {sk}",
            100_000 + sk * 50_000, str(200 + sk), rng.choice(STREET_NAMES),
            rng.choice(STREET_TYPES), f"Suite {sk}", CITIES[sk % len(CITIES)],
            COUNTIES[sk % len(COUNTIES)], STATES[sk % 6],
            f"{38100 + sk}", "United States", GMT[sk % 2],
        ))
    return rows


def _web_sites(rng):
    rows = []
    for sk in range(1, N_WEB_SITE + 1):
        rows.append((
            sk, _id("WS", sk), D0, None, f"site_{(sk - 1) % 4}",
            JULIAN_D0 + sk, None, "Unknown",
            FIRST[sk % len(FIRST)] + " " + LAST[sk % len(LAST)],
            sk % 6 + 1, "Unknown", f"mkt desc {sk}",
            FIRST[(sk + 1) % len(FIRST)] + " " + LAST[(sk + 2) % len(LAST)],
            sk % 2 + 1, "pri", str(300 + sk), rng.choice(STREET_NAMES),
            rng.choice(STREET_TYPES), f"Suite {sk}", CITIES[sk % len(CITIES)],
            COUNTIES[sk % len(COUNTIES)], STATES[sk % 6], f"{38200 + sk}",
            "United States", GMT[sk % 2], _dec(rng, 0.0, 0.12),
        ))
    return rows


def _web_pages(rng):
    rows = []
    for sk in range(1, N_WEB_PAGE + 1):
        rows.append((
            sk, _id("WP", sk), D0, None, JULIAN_D0 + sk, JULIAN_D0 + sk + 30,
            "Y" if sk % 2 else "N", None, f"http://www.example.org/{sk}",
            rng.choice(["ad", "dynamic", "feedback", "general", "order",
                        "protected", "welcome"]),
            2500 + (sk * 331) % 2800,  # covers the 5000-5200 predicate band
            sk % 25, sk % 7, sk % 4 + 1,
        ))
    return rows


def _call_centers(rng):
    rows = []
    for sk in range(1, N_CALL_CENTER + 1):
        rows.append((
            sk, _id("CC", (sk + 1) // 2), D0, None, None, JULIAN_D0 + sk,
            f"{['NY Metro', 'Mid Atlantic', 'North Midwest', 'California'][sk - 1]}",
            "large", 100 + sk * 50, 1000 + sk * 500, "8AM-8PM",
            FIRST[sk % len(FIRST)] + " " + LAST[sk % len(LAST)], sk % 6 + 1,
            "Unknown", f"call center mkt desc {sk}",
            FIRST[(sk + 2) % len(FIRST)] + " " + LAST[(sk + 3) % len(LAST)],
            sk % 2 + 1, "pri", sk % 2 + 1, "Unknown", str(400 + sk),
            rng.choice(STREET_NAMES), rng.choice(STREET_TYPES),
            f"Suite {sk}", CITIES[sk % len(CITIES)], COUNTIES[sk % len(COUNTIES)],
            STATES[sk % 6], f"{38300 + sk}", "United States", GMT[sk % 2],
            _dec(rng, 0.0, 0.12),
        ))
    return rows


def _catalog_pages(rng):
    rows = []
    for sk in range(1, N_CATALOG_PAGE + 1):
        rows.append((
            sk, _id("CP", sk), JULIAN_D0 + (sk % 5) * 360,
            JULIAN_D0 + (sk % 5) * 360 + 359, "DEPARTMENT", sk % 5 + 1,
            (sk - 1) // 5 + 1, f"catalog page description {sk}",
            rng.choice(["monthly", "quarterly", "bi-annual"]),
        ))
    return rows


def _promotions(rng):
    rows = []
    for sk in range(1, N_PROMO + 1):
        rows.append((
            sk, _id("P", sk), JULIAN_D0 + sk * 30, JULIAN_D0 + sk * 30 + 60,
            (sk * 11) % N_ITEM + 1, Decimal("1000.00"), sk % 5 + 1,
            f"promo{sk}",
            "Y" if sk % 3 == 0 else "N", "Y" if sk % 4 == 0 else "N",
            "Y" if sk % 5 == 0 else "N", "Y" if sk % 3 == 1 else "N",
            "Y" if sk % 7 == 0 else "N", "Y" if sk % 2 == 0 else "N",
            "Y" if sk % 6 == 0 else "N", "Y" if sk % 8 == 0 else "N",
            "details", "Unknown", "Y" if sk % 2 else "N",
        ))
    return rows


def _reasons():
    descs = ["Package was damaged", "Stopped working", "Did not fit",
             "Found a better price", "Not the product ordered",
             "Parts missing", "Does not work with other products",
             "Gift exchange", "Did not like the color", "Duplicate purchase"]
    return [(i + 1, _id("R", i + 1), d) for i, d in enumerate(descs)]


def _ship_modes():
    rows = []
    sk = 0
    for t in SHIP_TYPES:
        for c in ("AIR", "SURFACE", "SEA"):
            sk += 1
            if sk > 10:
                break
            rows.append((sk, _id("SM", sk), t, c, CARRIERS[sk - 1], ""))
    return rows


def _inventory(rng, date_sks):
    rows = []
    weekly = date_sks[::7]
    for d in weekly[: 26 * 6]:  # ~6 years of weekly snapshots
        for item in range(1, N_ITEM + 1, 4):  # every 4th item tracked
            for w in range(1, N_WAREHOUSE + 1):
                rows.append((d, item, w, rng.randrange(0, 1000)))
    return rows


def _money(rng, qty):
    """One line item's money columns, internally consistent."""
    wholesale = _dec(rng, 1.0, 80.0)
    list_p = (wholesale * Decimal(rng.randrange(110, 220)) / 100).quantize(Decimal("0.01"))
    sales_p = (list_p * Decimal(rng.randrange(20, 100)) / 100).quantize(Decimal("0.01"))
    ext_discount = ((list_p - sales_p) * qty).quantize(Decimal("0.01"))
    ext_sales = sales_p * qty
    ext_wholesale = wholesale * qty
    ext_list = list_p * qty
    tax = (ext_sales * Decimal(rng.randrange(0, 9)) / 100).quantize(Decimal("0.01"))
    coupon = (ext_sales * Decimal(rng.randrange(0, 30)) / 100).quantize(Decimal("0.01")) if rng.random() < 0.2 else Decimal("0.00")
    ship = (ext_sales * Decimal(rng.randrange(0, 25)) / 100).quantize(Decimal("0.01"))
    net_paid = ext_sales - coupon
    return {
        "wholesale": wholesale, "list": list_p, "sales": sales_p,
        "ext_discount": ext_discount, "ext_sales": ext_sales,
        "ext_wholesale": ext_wholesale, "ext_list": ext_list, "tax": tax,
        "coupon": coupon, "ship": ship, "net_paid": net_paid,
        "net_paid_tax": net_paid + tax,
        "net_paid_ship": net_paid + ship,
        "net_paid_ship_tax": net_paid + ship + tax,
        "profit": net_paid - ext_wholesale,
    }


def _gen_store(rng, date_sks, n_cdemo, n_orders=N_STORE_ORDERS):
    sales, returns = [], []
    for ticket in range(1, n_orders + 1):
        d = rng.choice(date_sks)
        t = rng.randrange(0, 1440) * 60
        cust = rng.randrange(1, N_CUSTOMER + 1)
        cdemo = rng.randrange(1, n_cdemo + 1)
        hdemo = rng.randrange(1, 101)
        addr = rng.randrange(1, N_ADDRESS + 1)
        store = rng.randrange(1, N_STORE + 1)
        for _ in range(1 + rng.randrange(0, 3)):
            item = rng.randrange(1, N_ITEM + 1)
            qty = rng.randrange(1, 100)
            m = _money(rng, qty)
            promo = rng.randrange(1, N_PROMO + 1) if rng.random() < 0.5 else None
            sales.append((
                d if rng.random() > 0.01 else None, t, item, cust, cdemo,
                hdemo, addr, store, promo, ticket, qty,
                m["wholesale"], m["list"], m["sales"], m["ext_discount"],
                m["ext_sales"], m["ext_wholesale"], m["ext_list"], m["tax"],
                m["coupon"], m["net_paid"], m["net_paid_tax"], m["profit"],
            ))
            if rng.random() < 0.10:
                rq = rng.randrange(1, qty + 1)
                amt = (m["sales"] * rq).quantize(Decimal("0.01"))
                rtax = (amt * Decimal("0.05")).quantize(Decimal("0.01"))
                fee = _dec(rng, 0.5, 50.0)
                returns.append((
                    d + rng.randrange(1, 60) if d is not None else None,
                    t, item, cust if rng.random() > 0.02 else None,
                    cdemo, hdemo, addr, store,
                    rng.randrange(1, 11), ticket, rq, amt, rtax,
                    amt + rtax, fee, _dec(rng, 0.5, 30.0),
                    (amt * Decimal("0.7")).quantize(Decimal("0.01")),
                    (amt * Decimal("0.2")).quantize(Decimal("0.01")),
                    (amt * Decimal("0.1")).quantize(Decimal("0.01")),
                    (amt * Decimal("0.3") + fee).quantize(Decimal("0.01")),
                ))
    return sales, returns


def _gen_catalog(rng, date_sks, n_cdemo, n_orders=N_CATALOG_ORDERS):
    sales, returns = [], []
    for order in range(1, n_orders + 1):
        d = rng.choice(date_sks)
        t = rng.randrange(0, 1440) * 60
        bill = rng.randrange(1, N_CUSTOMER + 1)
        ship_cust = bill if rng.random() < 0.8 else rng.randrange(1, N_CUSTOMER + 1)
        cdemo = rng.randrange(1, n_cdemo + 1)
        hdemo = rng.randrange(1, 101)
        addr = rng.randrange(1, N_ADDRESS + 1)
        ship_addr = rng.randrange(1, N_ADDRESS + 1)
        cc = rng.randrange(1, N_CALL_CENTER + 1)
        page = rng.randrange(1, N_CATALOG_PAGE + 1)
        for _ in range(1 + rng.randrange(0, 3)):
            item = rng.randrange(1, N_ITEM + 1)
            qty = rng.randrange(1, 100)
            m = _money(rng, qty)
            wh = rng.randrange(1, N_WAREHOUSE + 1)  # per LINE: q16 needs >1/order
            sm = rng.randrange(1, 11)
            ship_d = d + rng.randrange(1, 120)
            promo = rng.randrange(1, N_PROMO + 1) if rng.random() < 0.5 else None
            sales.append((
                d, t, ship_d, bill, cdemo, hdemo, addr, ship_cust, cdemo,
                hdemo, ship_addr, cc, page, sm, wh, item, promo, order, qty,
                m["wholesale"], m["list"], m["sales"], m["ext_discount"],
                m["ext_sales"], m["ext_wholesale"], m["ext_list"], m["tax"],
                m["coupon"], m["ship"], m["net_paid"], m["net_paid_tax"],
                m["net_paid_ship"], m["net_paid_ship_tax"], m["profit"],
            ))
            if rng.random() < 0.10:
                rq = rng.randrange(1, qty + 1)
                amt = (m["sales"] * rq).quantize(Decimal("0.01"))
                rtax = (amt * Decimal("0.05")).quantize(Decimal("0.01"))
                fee = _dec(rng, 0.5, 50.0)
                returns.append((
                    d + rng.randrange(1, 90), t, item, bill, cdemo, hdemo,
                    addr, bill, cdemo, hdemo, addr, cc, page, sm, wh,
                    rng.randrange(1, 11), order, rq, amt, rtax, amt + rtax,
                    fee, _dec(rng, 0.5, 30.0),
                    (amt * Decimal("0.7")).quantize(Decimal("0.01")),
                    (amt * Decimal("0.2")).quantize(Decimal("0.01")),
                    (amt * Decimal("0.1")).quantize(Decimal("0.01")),
                    (amt * Decimal("0.3") + fee).quantize(Decimal("0.01")),
                ))
    return sales, returns


def _gen_web(rng, date_sks, n_cdemo, n_orders=N_WEB_ORDERS):
    sales, returns = [], []
    for order in range(1, n_orders + 1):
        d = rng.choice(date_sks)
        t = rng.randrange(0, 1440) * 60
        bill = rng.randrange(1, N_CUSTOMER + 1)
        ship_cust = bill if rng.random() < 0.8 else rng.randrange(1, N_CUSTOMER + 1)
        cdemo = rng.randrange(1, n_cdemo + 1)
        hdemo = rng.randrange(1, 101)
        addr = rng.randrange(1, N_ADDRESS + 1)
        ship_addr = rng.randrange(1, N_ADDRESS + 1)
        page = rng.randrange(1, N_WEB_PAGE + 1)
        site = rng.randrange(1, N_WEB_SITE + 1)
        for _ in range(1 + rng.randrange(0, 3)):
            item = rng.randrange(1, N_ITEM + 1)
            qty = rng.randrange(1, 100)
            m = _money(rng, qty)
            wh = rng.randrange(1, N_WAREHOUSE + 1)
            sm = rng.randrange(1, 11)
            ship_d = d + rng.randrange(1, 120)
            promo = rng.randrange(1, N_PROMO + 1) if rng.random() < 0.5 else None
            sales.append((
                d, t, ship_d, item, bill, cdemo, hdemo, addr, ship_cust,
                cdemo, hdemo, ship_addr, page, site, sm, wh, promo, order,
                qty, m["wholesale"], m["list"], m["sales"], m["ext_discount"],
                m["ext_sales"], m["ext_wholesale"], m["ext_list"], m["tax"],
                m["coupon"], m["ship"], m["net_paid"], m["net_paid_tax"],
                m["net_paid_ship"], m["net_paid_ship_tax"], m["profit"],
            ))
            if rng.random() < 0.10:
                rq = rng.randrange(1, qty + 1)
                amt = (m["sales"] * rq).quantize(Decimal("0.01"))
                rtax = (amt * Decimal("0.05")).quantize(Decimal("0.01"))
                fee = _dec(rng, 0.5, 50.0)
                returns.append((
                    d + rng.randrange(1, 90), t, item, bill, cdemo, hdemo,
                    addr, bill, cdemo, hdemo, addr, page,
                    rng.randrange(1, 11), order, rq, amt, rtax, amt + rtax,
                    fee, _dec(rng, 0.5, 30.0),
                    (amt * Decimal("0.7")).quantize(Decimal("0.01")),
                    (amt * Decimal("0.2")).quantize(Decimal("0.01")),
                    (amt * Decimal("0.1")).quantize(Decimal("0.01")),
                    (amt * Decimal("0.3") + fee).quantize(Decimal("0.01")),
                ))
    return sales, returns


def generate(out_dir: str, scale: float = 1.0) -> dict[str, int]:
    """Write every table as <out_dir>/<table>.parquet; returns row counts.
    Deterministic for a given (VERSION, scale) — callers key their cache
    on both. ``scale`` multiplies the FACT order counts (dimensions stay
    fixed, like a real star schema scaling out)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ops_spark.queries.tpcds_corpus import TPCDS_TABLES

    os.makedirs(out_dir, exist_ok=True)
    date_rows = _date_dim()
    date_sks = [r[0] for r in date_rows]
    cdemo_rows = _cdemo()
    n_cdemo = len(cdemo_rows)

    rngs = {t: random.Random(f"tpcds-tiny-v{VERSION}-{t}")
            for t in TPCDS_TABLES}
    ss, sr = _gen_store(rngs["store_sales"], date_sks, n_cdemo,
                        int(N_STORE_ORDERS * scale))
    cs, cr = _gen_catalog(rngs["catalog_sales"], date_sks, n_cdemo,
                          int(N_CATALOG_ORDERS * scale))
    ws, wr = _gen_web(rngs["web_sales"], date_sks, n_cdemo,
                      int(N_WEB_ORDERS * scale))
    data = {
        "date_dim": date_rows,
        "time_dim": _time_dim(),
        "item": _items(rngs["item"]),
        "customer_address": _addresses(rngs["customer_address"]),
        "customer_demographics": cdemo_rows,
        "household_demographics": _hdemo(),
        "income_band": [(i, (i - 1) * 10000, i * 10000 - 1) for i in range(1, 21)],
        "customer": _customers(rngs["customer"], n_cdemo),
        "store": _stores(rngs["store"]),
        "warehouse": _warehouses(rngs["warehouse"]),
        "web_site": _web_sites(rngs["web_site"]),
        "web_page": _web_pages(rngs["web_page"]),
        "call_center": _call_centers(rngs["call_center"]),
        "catalog_page": _catalog_pages(rngs["catalog_page"]),
        "promotion": _promotions(rngs["promotion"]),
        "reason": _reasons(),
        "ship_mode": _ship_modes(),
        "inventory": _inventory(rngs["inventory"], date_sks),
        "store_sales": ss, "store_returns": sr,
        "catalog_sales": cs, "catalog_returns": cr,
        "web_sales": ws, "web_returns": wr,
    }

    # deterministic domain-coverage rows so corpus predicates the random
    # domains never bind return NON-EMPTY results (VERDICT r9 #3)
    from ops_spark.queries.tpcds_coverage import inject

    inject(data, scale, JULIAN_D0, D0, N_ITEM, N_CUSTOMER, N_ADDRESS)

    def pa_type(t: str):
        if t == "int":
            return pa.int32()
        if t == "bigint":
            return pa.int64()
        if t == "string":
            return pa.string()
        if t == "date":
            return pa.date32()
        if t.startswith("decimal"):
            p, s = t[8:-1].split(",")
            return pa.decimal128(int(p), int(s))
        raise ValueError(t)

    counts = {}
    for table, schema_str in TPCDS_TABLES.items():
        cols = [c.rsplit(" ", 1) for c in schema_str.split(", ")]
        fields = [pa.field(n, pa_type(t)) for n, t in cols]
        rows = data[table]
        arrays = [
            pa.array([r[i] for r in rows], type=f.type)
            for i, f in enumerate(fields)
        ]
        pq.write_table(
            pa.Table.from_arrays(arrays, schema=pa.schema(fields)),
            os.path.join(out_dir, f"{table}.parquet"),
        )
        counts[table] = len(rows)
    return counts


def cached_dir(scale: float = 1.0) -> str:
    """Generate once per (VERSION, scale) into a shared tmp cache."""
    import tempfile

    suffix = "" if scale == 1.0 else f"_x{scale:g}"
    d = os.path.join(
        tempfile.gettempdir(), f"ops_spark_tpcds_tiny_v{VERSION}{suffix}"
    )
    marker = os.path.join(d, "_COMPLETE")
    if not os.path.exists(marker):
        generate(d, scale=scale)
        open(marker, "w").close()
    return d
