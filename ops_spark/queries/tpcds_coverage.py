"""Domain-coverage injections for the tiny TPC-DS dataset (VERDICT r9
#3): deterministic, referentially consistent rows appended AFTER the
random generation so that corpus queries whose predicates the random
domains never bind — specific manufacturer ids, brand/class/category
triples, zip literals, null-FK channels, cross-channel
sale→return→repurchase chains, coefficient-of-variation inventory —
return NON-EMPTY results, turning their oracle value-match from vacuous
to real. ~35 of the 156 published texts returned empty on the v2
dataset; each block below names the queries it binds and mirrors the
query's own literals.

Injections are scale-INDEPENDENT fixed rows (the oracle compares
Spark vs DuckDB on identical data, so absolute counts are free), with
two exceptions that must keep pace with the random facts: the q23b
"whale" customer (its store-sales total must stay above 50% of the max
customer total at any --tpcds-oracle multiplier) scales linearly.

Surrogate-key layout (all beyond the random ranges, so random facts
never reference them): items N_ITEM+1.., addresses N_ADDRESS+1..,
customers N_CUSTOMER+1.., stores N_STORE+1.., hdemo 101.., reasons
11.., ss tickets 900001.., cs orders 910001.., ws orders 920001..
"""

from __future__ import annotations

import datetime as dt
from decimal import Decimal


def _mk_row_builder(schema_str: str):
    cols = [c.rsplit(" ", 1)[0] for c in schema_str.split(", ")]
    idx = {c: i for i, c in enumerate(cols)}

    def row(**kv):
        out = [None] * len(cols)
        for k, v in kv.items():
            out[idx[k]] = v  # KeyError on a typo'd column = loud failure
        return tuple(out)

    return row


def _D(x) -> Decimal:
    return Decimal(str(x)).quantize(Decimal("0.01"))


def _sale_money(qty: int, sales: float, wholesale: float) -> dict:
    """Internally consistent money columns for an injected line: no tax,
    no coupon, no ship — net_paid == ext_sales, profit = sales-wholesale
    margins. list price = sales (sold at list)."""
    s, w = _D(sales), _D(wholesale)
    return {
        "wholesale": w, "list": s, "sales": s,
        "ext_discount": _D(0), "ext_sales": s * qty,
        "ext_wholesale": w * qty, "ext_list": s * qty,
        "tax": _D(0), "coupon": _D(0), "ship": _D(0),
        "net_paid": s * qty, "net_paid_tax": s * qty,
        "net_paid_ship": s * qty, "net_paid_ship_tax": s * qty,
        "profit": (s - w) * qty,
    }


def inject(data: dict, scale: float, julian_d0: int, d0: dt.date,
           n_item: int, n_customer: int, n_address: int) -> None:
    """Append coverage rows to the table lists in ``data`` in place."""
    from ops_spark.queries.tpcds_corpus import TPCDS_TABLES

    R = {t: _mk_row_builder(s) for t, s in TPCDS_TABLES.items()}

    def jd(date: dt.date) -> int:
        return julian_d0 + (date - d0).days

    def item(sk, *, price, manufact_id=500, category="Books", class_=None,
             brand=None, brand_id=None, color="red", units="Each",
             size="medium", manufact=None):
        cat_i = ["Books", "Children", "Electronics", "Home", "Jewelry",
                 "Men", "Music", "Shoes", "Sports", "Women"].index(category)
        data["item"].append(R["item"](
            i_item_sk=sk, i_item_id=f"I{sk:012d}"[:16], i_rec_start_date=d0,
            i_item_desc=f"coverage item {sk}", i_current_price=_D(price),
            i_wholesale_cost=_D(price) / 2,
            i_brand_id=brand_id if brand_id is not None else 9000 + sk,
            i_brand=brand or f"covbrand{sk}",
            i_class_id=90, i_class=class_ or "coverage",
            i_category_id=cat_i + 1, i_category=category,
            i_manufact_id=manufact_id,
            i_manufact=manufact or f"manufact{manufact_id}",
            i_size=size, i_formulation="formulation", i_color=color,
            i_units=units, i_container="Unknown", i_manager_id=90,
            i_product_name=f"covproduct{sk}",
        ))

    tick = [900000]
    corder = [910000]
    worder = [920000]

    def ss(date, it, *, cust=None, store=1, qty=10, sales=20.0,
           wholesale=10.0, cdemo=None, hdemo=None, addr=None, promo=None,
           ticket=None, profit=None, store_null=False):
        if ticket is None:
            tick[0] += 1
            ticket = tick[0]
        m = _sale_money(qty, sales, wholesale)
        if profit is not None:
            m["profit"] = _D(profit)
        data["store_sales"].append(R["store_sales"](
            ss_sold_date_sk=jd(date) if date else None,
            ss_sold_time_sk=36000, ss_item_sk=it, ss_customer_sk=cust,
            ss_cdemo_sk=cdemo, ss_hdemo_sk=hdemo, ss_addr_sk=addr,
            ss_store_sk=None if store_null else store, ss_promo_sk=promo,
            ss_ticket_number=ticket, ss_quantity=qty,
            ss_wholesale_cost=m["wholesale"], ss_list_price=m["list"],
            ss_sales_price=m["sales"], ss_ext_discount_amt=m["ext_discount"],
            ss_ext_sales_price=m["ext_sales"],
            ss_ext_wholesale_cost=m["ext_wholesale"],
            ss_ext_list_price=m["ext_list"], ss_ext_tax=m["tax"],
            ss_coupon_amt=m["coupon"], ss_net_paid=m["net_paid"],
            ss_net_paid_inc_tax=m["net_paid_tax"], ss_net_profit=m["profit"],
        ))
        return ticket, m

    def sr(date, it, ticket, *, cust=None, qty=5, amt=100.0, store=1,
           cdemo=None, hdemo=None, addr=None, reason=1):
        a = _D(amt)
        data["store_returns"].append(R["store_returns"](
            sr_returned_date_sk=jd(date), sr_return_time_sk=36000,
            sr_item_sk=it, sr_customer_sk=cust, sr_cdemo_sk=cdemo,
            sr_hdemo_sk=hdemo, sr_addr_sk=addr, sr_store_sk=store,
            sr_reason_sk=reason, sr_ticket_number=ticket,
            sr_return_quantity=qty, sr_return_amt=a, sr_return_tax=_D(0),
            sr_return_amt_inc_tax=a, sr_fee=_D(5), sr_return_ship_cost=_D(2),
            sr_refunded_cash=_D(float(a) * 0.7),
            sr_reversed_charge=_D(float(a) * 0.2),
            sr_store_credit=_D(float(a) * 0.1),
            sr_net_loss=_D(float(a) * 0.3),
        ))

    def cs(date, it, *, bill=None, qty=10, sales=20.0, wholesale=10.0,
           cdemo=None, hdemo=None, addr=1, ship_addr=1, ship_addr_null=False,
           cc=1, wh=1, ship_days=30, promo=None, order=None, profit=None,
           list_price=None):
        if order is None:
            corder[0] += 1
            order = corder[0]
        m = _sale_money(qty, sales, wholesale)
        if list_price is not None:
            m["list"] = _D(list_price)
            m["ext_list"] = _D(list_price) * qty
        if profit is not None:
            m["profit"] = _D(profit)
        data["catalog_sales"].append(R["catalog_sales"](
            cs_sold_date_sk=jd(date), cs_sold_time_sk=36000,
            cs_ship_date_sk=jd(date + dt.timedelta(days=ship_days)),
            cs_bill_customer_sk=bill, cs_bill_cdemo_sk=cdemo,
            cs_bill_hdemo_sk=hdemo, cs_bill_addr_sk=addr,
            cs_ship_customer_sk=bill, cs_ship_cdemo_sk=cdemo,
            cs_ship_hdemo_sk=hdemo,
            cs_ship_addr_sk=None if ship_addr_null else ship_addr,
            cs_call_center_sk=cc, cs_catalog_page_sk=1, cs_ship_mode_sk=1,
            cs_warehouse_sk=wh, cs_item_sk=it, cs_promo_sk=promo,
            cs_order_number=order, cs_quantity=qty,
            cs_wholesale_cost=m["wholesale"], cs_list_price=m["list"],
            cs_sales_price=m["sales"], cs_ext_discount_amt=m["ext_discount"],
            cs_ext_sales_price=m["ext_sales"],
            cs_ext_wholesale_cost=m["ext_wholesale"],
            cs_ext_list_price=m["ext_list"], cs_ext_tax=m["tax"],
            cs_coupon_amt=m["coupon"], cs_ext_ship_cost=m["ship"],
            cs_net_paid=m["net_paid"], cs_net_paid_inc_tax=m["net_paid_tax"],
            cs_net_paid_inc_ship=m["net_paid_ship"],
            cs_net_paid_inc_ship_tax=m["net_paid_ship_tax"],
            cs_net_profit=m["profit"],
        ))
        return order, m

    def cr(date, it, order, *, returning=None, refunded=None, qty=5,
           amt=100.0, cc=1, reason=1, cdemo=None, addr=1):
        a = _D(amt)
        data["catalog_returns"].append(R["catalog_returns"](
            cr_returned_date_sk=jd(date), cr_returned_time_sk=36000,
            cr_item_sk=it, cr_refunded_customer_sk=refunded,
            cr_refunded_cdemo_sk=cdemo, cr_refunded_hdemo_sk=1,
            cr_refunded_addr_sk=addr, cr_returning_customer_sk=returning,
            cr_returning_cdemo_sk=cdemo, cr_returning_hdemo_sk=1,
            cr_returning_addr_sk=addr, cr_call_center_sk=cc,
            cr_catalog_page_sk=1, cr_ship_mode_sk=1, cr_warehouse_sk=1,
            cr_reason_sk=reason, cr_order_number=order,
            cr_return_quantity=qty, cr_return_amount=a, cr_return_tax=_D(0),
            cr_return_amt_inc_tax=a, cr_fee=_D(5), cr_return_ship_cost=_D(2),
            cr_refunded_cash=_D(float(a) * 0.7),
            cr_reversed_charge=_D(float(a) * 0.2),
            cr_store_credit=_D(float(a) * 0.1),
            cr_net_loss=_D(float(a) * 0.3),
        ))

    def ws(date, it, *, bill=None, qty=10, sales=20.0, wholesale=10.0,
           cdemo=None, hdemo=None, addr=1, page=1, site=1, wh=1,
           ship_cust=None, ship_cust_null=False, order=None, profit=None):
        if order is None:
            worder[0] += 1
            order = worder[0]
        m = _sale_money(qty, sales, wholesale)
        if profit is not None:
            m["profit"] = _D(profit)
        data["web_sales"].append(R["web_sales"](
            ws_sold_date_sk=jd(date), ws_sold_time_sk=36000,
            ws_ship_date_sk=jd(date + dt.timedelta(days=30)), ws_item_sk=it,
            ws_bill_customer_sk=bill, ws_bill_cdemo_sk=cdemo,
            ws_bill_hdemo_sk=hdemo, ws_bill_addr_sk=addr,
            ws_ship_customer_sk=(None if ship_cust_null
                                 else (ship_cust or bill)),
            ws_ship_cdemo_sk=cdemo, ws_ship_hdemo_sk=hdemo,
            ws_ship_addr_sk=addr, ws_web_page_sk=page, ws_web_site_sk=site,
            ws_ship_mode_sk=1, ws_warehouse_sk=wh, ws_promo_sk=None,
            ws_order_number=order, ws_quantity=qty,
            ws_wholesale_cost=m["wholesale"], ws_list_price=m["list"],
            ws_sales_price=m["sales"], ws_ext_discount_amt=m["ext_discount"],
            ws_ext_sales_price=m["ext_sales"],
            ws_ext_wholesale_cost=m["ext_wholesale"],
            ws_ext_list_price=m["ext_list"], ws_ext_tax=m["tax"],
            ws_coupon_amt=m["coupon"], ws_ext_ship_cost=m["ship"],
            ws_net_paid=m["net_paid"], ws_net_paid_inc_tax=m["net_paid_tax"],
            ws_net_paid_inc_ship=m["net_paid_ship"],
            ws_net_paid_inc_ship_tax=m["net_paid_ship_tax"],
            ws_net_profit=m["profit"],
        ))
        return order, m

    def wr(date, it, order, *, refunded_cdemo=None, returning_cdemo=None,
           refunded_addr=1, reason=1, qty=2, amt=100.0, cust=None):
        a = _D(amt)
        data["web_returns"].append(R["web_returns"](
            wr_returned_date_sk=jd(date), wr_returned_time_sk=36000,
            wr_item_sk=it, wr_refunded_customer_sk=cust,
            wr_refunded_cdemo_sk=refunded_cdemo, wr_refunded_hdemo_sk=1,
            wr_refunded_addr_sk=refunded_addr, wr_returning_customer_sk=cust,
            wr_returning_cdemo_sk=returning_cdemo, wr_returning_hdemo_sk=1,
            wr_returning_addr_sk=refunded_addr, wr_web_page_sk=1,
            wr_reason_sk=reason, wr_order_number=order,
            wr_return_quantity=qty, wr_return_amt=a, wr_return_tax=_D(0),
            wr_return_amt_inc_tax=a, wr_fee=_D(5), wr_return_ship_cost=_D(2),
            wr_refunded_cash=_D(float(a) * 0.7),
            wr_reversed_charge=_D(float(a) * 0.2),
            wr_account_credit=_D(float(a) * 0.1),
            wr_net_loss=_D(float(a) * 0.3),
        ))

    def inv(date, it, wh, qty):
        data["inventory"].append(R["inventory"](
            inv_date_sk=jd(date), inv_item_sk=it, inv_warehouse_sk=wh,
            inv_quantity_on_hand=qty,
        ))

    I = n_item  # item sks I+1..

    # ---- dimensions --------------------------------------------------
    # q3: i_manufact_id = 128, d_moy = 11 | modified q3: 436, d_moy = 12
    item(I + 1, price=30, manufact_id=128)
    item(I + 2, price=30, manufact_id=436)
    # q37: manufact IN (677,940,694,808), price 68..98, inventory window
    for k, m in enumerate((677, 940, 694, 808)):
        item(I + 3 + k, price=75, manufact_id=m)
    # q82: manufact IN (129,270,821,423), price 62..92
    for k, m in enumerate((129, 270, 821, 423)):
        item(I + 7 + k, price=70, manufact_id=m)
    # q53/q63 (+modified): the exact (category, class, brand) triples
    groupA = [("Books", "personal", "scholaramalgamalg #14"),
              ("Children", "portable", "scholaramalgamalg #7"),
              ("Electronics", "reference", "exportiunivamalg #9"),
              ("Books", "self-help", "scholaramalgamalg #9")]
    groupB = [("Women", "accessories", "amalgimporto #1"),
              ("Music", "classical", "edu packscholar #1"),
              ("Men", "fragrances", "exportiimporto #1"),
              ("Men", "pants", "importoamalg #1")]
    for k, (cat, cls, brand) in enumerate(groupA + groupB):
        # distinct manufact_id per item: q53/q63 group and window over
        # i_manufact_id, so pooling them would flatten the monthly sums
        item(I + 11 + k, price=25, category=cat, class_=cls, brand=brand,
             brand_id=8000 + k, manufact_id=600 + k)
    # q41: manufact_id 738..778 with the exact attribute combos, same
    # i_manufact so the correlated count(*) > 0 binds (item-only query)
    for k, (cat, color, unit, size) in enumerate([
        ("Women", "powder", "Ounce", "medium"),
        ("Women", "brown", "Bunch", "N/A"),
        ("Men", "floral", "N/A", "petite"),
        ("Men", "light", "Box", "medium"),
    ]):
        item(I + 19 + k, price=30, manufact_id=740, manufact="manufact740",
             category=cat, color=color, units=unit, size=size)
    # q24a/b + v2.7 q24: colors pale/chiffon at a market-8 store
    item(I + 23, price=40, color="pale")
    item(I + 24, price=40, color="chiffon")
    # q56: colors slate/blanched/burnished, y2001 moy2, gmt -5
    for k, c in enumerate(("slate", "blanched", "burnished")):
        item(I + 25 + k, price=35, color=c)
    item(I + 28, price=30)               # q58 tri-channel same-week item
    item(I + 29, price=30)               # q17/q25 sale→return→catalog
    item(I + 30, price=30)               # q29
    item(I + 31, price=68, color="purple")  # q64: price in 65..74
    item(I + 32, price=30)               # v2.7 q72 low-inventory item
    item(I + 33, price=1.20)             # q21: price in 0.99..1.49
    item(I + 34, price=30)               # q39a/b volatile inventory
    item(I + 35, price=30)               # q39a/b volatile inventory
    item(I + 36, price=30)               # q78 tri-channel, no returns
    item(I + 37, price=30)               # q83 tri-channel returns
    item(I + 38, price=30)               # q23b frequent item
    item(I + 39, price=30)               # q85 web sale+return
    item(I + 40, price=30)               # q91 catalog return Nov 1998
    item(I + 41, price=30)               # q84/q93 store return
    for k in range(12):                  # q44: store-4 ranking items
        item(I + 42 + k, price=30)
    for k in range(3):                   # q49: one per channel
        item(I + 54 + k, price=150)
    item(I + 57, price=30)               # q8 store-13 1998Q2 item

    # stores 13 (q8/q34/q73: Williamson County, zip 24128) and
    # 14 (q24: market_id 8, zip 30903)
    st = R["store"]
    data["store"].append(st(
        s_store_sk=13, s_store_id="S13COV", s_rec_start_date=d0,
        s_store_name="covstore13", s_number_employees=300,
        s_floor_space=5_000_000, s_hours="8AM-8PM", s_manager="Cov Mgr13",
        s_market_id=3, s_geography_class="Unknown",
        s_market_desc="coverage market", s_market_manager="Cov MM13",
        s_division_id=1, s_division_name="Unknown", s_company_id=1,
        s_company_name="Unknown", s_street_number="113",
        s_street_name="Main", s_street_type="Street", s_suite_number="Suite 1",
        s_city="Midway", s_county="Williamson County", s_state="TN",
        s_zip="24128", s_country="United States", s_gmt_offset=_D(-5),
        s_tax_percentage=_D(0.05),
    ))
    data["store"].append(st(
        s_store_sk=14, s_store_id="S14COV", s_rec_start_date=d0,
        s_store_name="covstore14", s_number_employees=300,
        s_floor_space=5_000_000, s_hours="8AM-8PM", s_manager="Cov Mgr14",
        s_market_id=8, s_geography_class="Unknown",
        s_market_desc="coverage market", s_market_manager="Cov MM14",
        s_division_id=1, s_division_name="Unknown", s_company_id=1,
        s_company_name="Unknown", s_street_number="114",
        s_street_name="Oak", s_street_type="Street", s_suite_number="Suite 1",
        s_city="Fairview", s_county="Walker County", s_state="GA",
        s_zip="30903", s_country="United States", s_gmt_offset=_D(-5),
        s_tax_percentage=_D(0.05),
    ))

    # addresses: 501 q24-zip; 502-513 q8 preferred zips; 514 Edgewood
    # (q84); 515 state IN (q85); 516 gmt -5 (q56)
    A = n_address
    ca = R["customer_address"]

    def addr(sk, *, city="Fairview", state="GA", zip_, gmt=-5.0,
             county="Walker County"):
        data["customer_address"].append(ca(
            ca_address_sk=sk, ca_address_id=f"A{sk:012d}"[:16],
            ca_street_number=str(sk), ca_street_name="Main",
            ca_street_type="Street", ca_suite_number="Suite 1", ca_city=city,
            ca_county=county, ca_state=state, ca_zip=zip_,
            ca_country="United States", ca_gmt_offset=_D(gmt),
            ca_location_type="condo",
        ))

    addr(A + 1, zip_="30903")
    for k in range(12):
        addr(A + 2 + k, zip_="24128", state="TN")
    addr(A + 14, city="Edgewood", zip_="50412")
    addr(A + 15, state="IN", zip_="47770")
    addr(A + 16, zip_="10144", gmt=-5.0)

    # household demographics 101: buy_potential '>10000' WITH vehicles
    # (the random rows give every '>10000' household vehicle_count -1,
    # so q34/q73's 'hd_vehicle_count > 0' never binds) — dep/veh 5/2 > 1.2
    data["household_demographics"].append(R["household_demographics"](
        hd_demo_sk=101, hd_income_band_sk=5, hd_buy_potential=">10000",
        hd_dep_count=5, hd_vehicle_count=2,
    ))

    # reasons 11..30 with the literal 'reason N' descs (q93: 'reason 28')
    for sk in range(11, 31):
        data["reason"].append(R["reason"](
            r_reason_sk=sk, r_reason_id=f"R{sk:012d}"[:16],
            r_reason_desc=f"reason {sk}",
        ))

    # cdemo sks for exact (gender, marital, education) combos — layout
    # mirrors _cdemo's nested loops (g in MF, m in MARITAL, e in
    # EDUCATION, cr in CREDIT)
    MARITAL = ["S", "M", "D", "W", "U"]
    EDUCATION = ["Primary", "Secondary", "College", "2 yr Degree",
                 "4 yr Degree", "Advanced Degree", "Unknown"]

    def cdemo_sk(marital, education):
        return ((MARITAL.index(marital) * 7)
                + EDUCATION.index(education)) * 4 + 1  # gender M, credit 0

    CD_M_ADV = cdemo_sk("M", "Advanced Degree")   # q85 branch 1
    CD_M_UNK = cdemo_sk("M", "Unknown")           # q91 branch 1
    CD_S = cdemo_sk("S", "Primary")               # any 'S' marital (q64)

    # customers
    C = n_customer
    cu = R["customer"]

    def customer(sk, *, last, cdemo=1, hdemo=1, addr_sk=1, preferred="N",
                 birth_country="United States"):
        data["customer"].append(cu(
            c_customer_sk=sk, c_customer_id=f"C{sk:012d}"[:16],
            c_current_cdemo_sk=cdemo, c_current_hdemo_sk=hdemo,
            c_current_addr_sk=addr_sk, c_first_shipto_date_sk=julian_d0 + 40,
            c_first_sales_date_sk=julian_d0 + 10, c_salutation="Mr.",
            c_first_name=f"Cov{sk - C}", c_last_name=last,
            c_preferred_cust_flag=preferred, c_birth_day=1, c_birth_month=1,
            c_birth_year=1970, c_birth_country=birth_country,
            c_email_address=f"cov{sk}@example.org",
            c_last_review_date=julian_d0 + 2000,
        ))

    customer(C + 1, last="Zzcova", cdemo=CD_S, addr_sk=A + 1,
             birth_country="UNITED STATES")          # q24 buyer 1
    customer(C + 2, last="Zzcovb", cdemo=CD_S, addr_sk=A + 1,
             birth_country="UNITED STATES")          # q24 buyer 2
    for k in range(12):                              # q8: >10 preferred per zip
        customer(C + 3 + k, last=f"Zzpref{k}", addr_sk=A + 2 + k,
                 preferred="Y")
    customer(C + 15, last="Zzq91", cdemo=CD_M_UNK, hdemo=5, addr_sk=2)
    customer(C + 16, last="Zzq84", cdemo=CD_M_UNK, hdemo=5, addr_sk=A + 14)
    customer(C + 17, last="Zzwhale")                 # q23b
    customer(C + 18, last="Zzq78")
    customer(C + 19, last="Zzq64", cdemo=CD_M_ADV, hdemo=3, addr_sk=7)

    # ---- facts -------------------------------------------------------
    # q3 / modified q3: manufact 128 in Novembers, 436 in Decembers
    for y in (1998, 1999, 2000):
        ss(dt.date(y, 11, 15), I + 1, cust=1, qty=8, sales=25)
        ss(dt.date(y, 12, 10), I + 2, cust=1, qty=8, sales=25)

    # q8: preferred-zip store sales, 1998 Q2 at the zip-24128 store
    ss(dt.date(1998, 5, 15), I + 57, cust=C + 3, store=13, qty=6, sales=30)
    ss(dt.date(1998, 6, 10), I + 57, cust=C + 4, store=13, qty=4, sales=30)

    # q34 / v2.7 q34 / modified q34: 15-20-line tickets, dom 1-3/25-28,
    # Williamson County, '>10000' household with vehicles
    for date, cust in ((dt.date(1999, 3, 1), 10), (dt.date(2000, 1, 26), 11)):
        tick[0] += 1
        t_no = tick[0]
        for line in range(16):
            ss(date, (line % 10) + 1, cust=cust, store=13, hdemo=101,
               qty=3, sales=15, ticket=t_no)
    # q73: same household/county shape, dom 1-2, 1-5-line tickets
    for date, cust in ((dt.date(1999, 5, 1), 12), (dt.date(2000, 8, 2), 13)):
        tick[0] += 1
        t_no = tick[0]
        for line in range(3):
            ss(date, (line % 10) + 1, cust=cust, store=13, hdemo=101,
               qty=3, sales=15, ticket=t_no)

    # q17 (quarter chain) + q25 (moy chain): store sale → store return →
    # catalog re-purchase by the same customer+item
    t_no, _ = ss(dt.date(2001, 2, 10), I + 29, cust=20, qty=10, sales=30)
    sr(dt.date(2001, 5, 10), I + 29, t_no, cust=20, qty=4, amt=120)
    cs(dt.date(2001, 6, 15), I + 29, bill=20, qty=6, sales=30)
    t_no, _ = ss(dt.date(2001, 4, 5), I + 29, cust=22, qty=10, sales=30)
    sr(dt.date(2001, 6, 1), I + 29, t_no, cust=22, qty=4, amt=120)
    cs(dt.date(2001, 7, 1), I + 29, bill=22, qty=6, sales=30)
    # q29: moy 9 1999 chain
    t_no, _ = ss(dt.date(1999, 9, 10), I + 30, cust=21, qty=10, sales=30)
    sr(dt.date(1999, 11, 15), I + 30, t_no, cust=21, qty=4, amt=120)
    cs(dt.date(2000, 3, 1), I + 30, bill=21, qty=6, sales=30)

    # q21: inventory straddling 2000-03-11 for a 0.99..1.49 item,
    # before/after ratio inside [2/3, 3/2]
    for date, q in ((dt.date(2000, 2, 20), 200), (dt.date(2000, 3, 1), 200),
                    (dt.date(2000, 3, 20), 300), (dt.date(2000, 4, 1), 150)):
        inv(date, I + 33, 1, q)

    # q37: inventory 100..500 in the 2000-02 window + a catalog sale
    for k in range(4):
        inv(dt.date(2000, 2, 15), I + 3 + k, 1, 300)
        inv(dt.date(2000, 3, 15), I + 3 + k, 1, 300)
        cs(dt.date(2000, 2, 20), I + 3 + k, bill=30, qty=5, sales=75)
    # q82: same shape, 2000-05-25 window, store sales
    for k in range(4):
        inv(dt.date(2000, 6, 10), I + 7 + k, 1, 300)
        inv(dt.date(2000, 7, 10), I + 7 + k, 1, 300)
        ss(dt.date(2000, 6, 15), I + 7 + k, cust=31, qty=5, sales=70)

    # q39a/b: coefficient of variation > 1.5 in BOTH Jan and Feb 2001
    # for item×warehouse pairs (weekly-ish snapshots, one spike)
    for it in (I + 34, I + 35):
        for wh in (1, 2):
            for moy, spike_day in ((1, 25), (2, 22)):
                for day, q in ((4, 1), (11, 1), (18, 1), (spike_day, 600)):
                    inv(dt.date(2001, moy, day), it, wh, q)

    # v2.7 q72: catalog sale y2001 ('M' cdemo, '1001-5000' household)
    # with same-week inventory BELOW the ordered quantity, ship > sold+5
    q72_day = dt.date(2001, 3, 5)
    cs(q72_day, I + 32, bill=32, cdemo=CD_M_UNK, hdemo=2, qty=50, sales=30)
    inv(q72_day, I + 32, 1, 5)

    # q53/q63 (+modified): monthly sales of the exact-triple items over
    # 2000-2002 with strong month-to-month deviation (>10% from avg)
    # q53/q63 sum ss_sales_price (unit price, not revenue), so the
    # deviation must come from ROW COUNTS: one spike month per item-year
    # gets 7 sale rows vs 1 elsewhere — quarterly sums 225 vs 75 and
    # monthly 175 vs 25, both far beyond the 10% deviation gates
    # per-month-distinct price: identical monthly sums would tie the
    # (sum - avg) ORDER BY keys at q89's LIMIT boundary, and engines may
    # legitimately pick different tied rows
    for k in range(8):
        it = I + 11 + k
        for y in (2000, 2001, 2002):
            for moy in range(1, 13):
                n_rows = 7 if moy == (k % 12) + 1 else 1
                for r in range(n_rows):
                    ss(dt.date(y, moy, 1 + 2 * r), it, cust=40, qty=5,
                       sales=25 + moy * 0.07 + k * 0.013 + (y - 2000) * 0.29)

    # q24a/b + v2.7 q24: pale/chiffon bought AND returned at the
    # market-8 store whose zip equals the buyers' address zip
    for cust in (C + 1, C + 2):
        for it in (I + 23, I + 24):
            t_no, _ = ss(dt.date(2001, 5, 10), it, cust=cust, store=14,
                         qty=10, sales=40)
            sr(dt.date(2001, 6, 10), it, t_no, cust=cust, qty=3, amt=120,
               store=14)

    # q56: the three colors sold in all channels, y2001 moy2, gmt -5
    for k in range(3):
        it = I + 25 + k
        ss(dt.date(2001, 2, 10), it, cust=41, addr=A + 16, qty=6, sales=35)
        cs(dt.date(2001, 2, 12), it, bill=41, addr=A + 16, qty=6, sales=35)
        ws(dt.date(2001, 2, 14), it, bill=41, addr=A + 16, qty=6, sales=35)

    # q58: one item, equal revenue in all 3 channels in the week of
    # 2000-01-03 (ratios land exactly at 1.0, inside [0.9, 1.1])
    wk = dt.date(2000, 1, 4)
    ss(wk, I + 28, cust=42, qty=10, sales=20)
    cs(wk, I + 28, bill=42, qty=10, sales=20)
    ws(wk, I + 28, bill=42, qty=10, sales=20)

    # q64 (+v2.7): store sale+return of a purple 65..74 item in 1999 AND
    # 2000 at one store, with a catalog sale+return whose list total
    # exceeds 2x the refund, promo attached, cdemo maritals differing
    for y in (1999, 2000):
        t_no, _ = ss(dt.date(y, 5, 5), I + 31, cust=C + 19, cdemo=CD_S,
                     hdemo=3, addr=7, store=1, promo=5, qty=4, sales=70)
        sr(dt.date(y, 6, 5), I + 31, t_no, cust=C + 19, qty=2, amt=140)
    o_no, _ = cs(dt.date(2000, 7, 1), I + 31, bill=C + 19, qty=10, sales=70,
                 list_price=80)
    cr(dt.date(2000, 8, 1), I + 31, o_no, returning=C + 19, refunded=C + 19,
       qty=2, amt=150)

    # q76: the three null-FK channels
    ss(dt.date(2000, 4, 10), 5, cust=2, qty=5, sales=20, store_null=True)
    ws(dt.date(2000, 4, 11), 6, bill=2, qty=5, sales=20, ship_cust_null=True)
    cs(dt.date(2000, 4, 12), 7, bill=2, qty=5, sales=20, ship_addr_null=True)

    # q78: same (customer, item, year) active in all three channels with
    # NO returns anywhere
    ss(dt.date(2000, 5, 20), I + 36, cust=C + 18, qty=8, sales=30)
    ws(dt.date(2000, 6, 20), I + 36, bill=C + 18, qty=8, sales=30)
    cs(dt.date(2000, 7, 20), I + 36, bill=C + 18, qty=8, sales=30)

    # q83: the same item returned in all three channels inside the
    # literal weeks ('2000-06-30', '2000-09-27', '2000-11-17')
    t_no, _ = ss(dt.date(2000, 6, 1), I + 37, cust=43, qty=10, sales=30)
    sr(dt.date(2000, 6, 30), I + 37, t_no, cust=43, qty=3, amt=90)
    o_no, _ = cs(dt.date(2000, 9, 1), I + 37, bill=43, qty=10, sales=30)
    cr(dt.date(2000, 9, 27), I + 37, o_no, returning=43, refunded=43,
       qty=3, amt=90)
    o_no, _ = ws(dt.date(2000, 10, 20), I + 37, bill=43, qty=10, sales=30)
    wr(dt.date(2000, 11, 17), I + 37, o_no, cust=43, qty=3, amt=90)

    # q84 + q93: a store return with the Edgewood customer's cdemo and
    # reason 28 ('reason 28' literal)
    t_no, _ = ss(dt.date(2000, 8, 10), I + 41, cust=C + 16, cdemo=CD_M_UNK,
                 qty=6, sales=30)
    sr(dt.date(2000, 9, 10), I + 41, t_no, cust=C + 16, cdemo=CD_M_UNK,
       qty=2, amt=60, reason=28)

    # q85: web sale+return y2000, sales price 100-150, profit 100-200,
    # refunded cdemo (M, Advanced Degree) both sides, refunded addr IN
    o_no, _ = ws(dt.date(2000, 4, 10), I + 39, bill=44, qty=3, sales=120,
                 wholesale=70)
    wr(dt.date(2000, 5, 10), I + 39, o_no, refunded_cdemo=CD_M_ADV,
       returning_cdemo=CD_M_ADV, refunded_addr=A + 15, reason=3, qty=1,
       amt=120, cust=44)

    # q91: catalog return in Nov 1998 by the (M, Unknown)/'Unknown%'
    # household/gmt -7 customer, through a call center
    o_no, _ = cs(dt.date(1998, 10, 1), I + 40, bill=C + 15, qty=5, sales=30)
    cr(dt.date(1998, 11, 10), I + 40, o_no, returning=C + 15,
       refunded=C + 15, cc=2, qty=2, amt=60)

    # q44: store-4 rows with NULL ss_addr_sk (the ranking threshold's
    # scalar subquery needs them to exist; a low avg lets the random
    # store-4 items qualify) + 12 ranked items with spread profits
    for k, p in enumerate((-120.0, -80.0)):
        ss(dt.date(2000, 3, 10 + k), 3, cust=3, store=4, qty=2, sales=10,
           profit=p)  # addr stays NULL (builder default)
    for k in range(12):
        ss(dt.date(2000, 3, 15), I + 42 + k, cust=3, store=4, qty=4,
           sales=20, profit=(k - 5) * 25.0)

    # q49 (+v2.7): December-2001 sales with >10000 return amounts in all
    # three channels (rank inputs; profit > 1, paid > 0, qty > 0)
    o_no, _ = ws(dt.date(2001, 12, 10), I + 54, bill=45, qty=90, sales=140,
                 wholesale=60)
    wr(dt.date(2001, 12, 20), I + 54, o_no, cust=45, qty=80, amt=11200)
    o_no, _ = cs(dt.date(2001, 12, 10), I + 55, bill=45, qty=90, sales=140,
                 wholesale=60)
    cr(dt.date(2001, 12, 20), I + 55, o_no, returning=45, refunded=45,
       qty=80, amt=11200)
    t_no, _ = ss(dt.date(2001, 12, 10), I + 56, cust=45, qty=90, sales=140,
                 wholesale=60)
    sr(dt.date(2001, 12, 20), I + 56, t_no, cust=45, qty=80, amt=11200)

    # q23b: a "whale" store customer (> 50% of the max customer total at
    # every scale — whale scales WITH the fact multiplier) who also buys
    # a frequent item (>4 same-day store sales) by catalog in Feb 2000
    n_whale = max(120, int(round(120 * scale)))
    for i in range(n_whale):
        day = dt.date(2000, 1, 1) + dt.timedelta(days=(i * 3) % 365)
        ss(day, (i % 10) + 1, cust=C + 17, qty=95, sales=170, wholesale=100)
    for _ in range(6):  # frequent: 6 sales of one item on one date
        ss(dt.date(2000, 3, 15), I + 38, cust=C + 17, qty=5, sales=30)
    cs(dt.date(2000, 2, 10), I + 38, bill=C + 17, qty=10, sales=30,
       list_price=35)
