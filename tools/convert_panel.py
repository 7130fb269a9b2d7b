#!/usr/bin/env python3
"""One-time ingest-side converter: SW_Updated.xlsx -> parquet fixtures.

Replicates the reference's exact read ranges (Main.R:32-37,47,58-60) using
only stdlib zip+xml (no openpyxl in this container):
  - header names from sheet FRED row 1 (A1:EQ1), duplicates uniquified with
    an _2 suffix (R's zoo dedupe; Spark rejects duplicate columns),
  - monthly panel from 'Monthly Data' A12:EQ707 (696 rows x 147 cols),
  - quarterly GDP from 'US GDP' A56:B287 (232 rows), applying the sheet's
    day/month-transposed date quirk (Main.R:47 strptime '%Y-%d-%m') and
    normalizing to the quarter's first day,
  - currency-unit name lists from FRED CW1:DA1, DK1:EB1, ED1:EP1.

Outputs: data/panel/monthly_panel.parquet, data/panel/gdp_quarterly.parquet,
data/panel/currency_names.txt. Deterministic; safe to re-run.
"""
import datetime
import json
import re
import sys
import zipfile
import xml.etree.ElementTree as ET

import pyarrow as pa
import pyarrow.parquet as pq

NS = {"m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main"}
XLSX = "/root/reference/SW_Updated.xlsx"
OUT = "data/panel"


def col_to_idx(ref):
    """'A'->1, 'EQ'->147."""
    n = 0
    for c in ref:
        n = n * 26 + (ord(c) - ord("A") + 1)
    return n


def load_sheet(z, path):
    cells = {}
    root = ET.fromstring(z.read(path))
    for c in root.iter("{%s}c" % NS["m"]):
        ref = c.get("r")
        m = re.match(r"([A-Z]+)(\d+)", ref)
        col, row = col_to_idx(m.group(1)), int(m.group(2))
        t = c.get("t")
        v = c.find("m:v", NS)
        if v is None:
            continue
        cells[(row, col)] = (t, v.text)
    return cells


def shared_strings(z):
    try:
        root = ET.fromstring(z.read("xl/sharedStrings.xml"))
    except KeyError:
        return []
    out = []
    for si in root.iter("{%s}si" % NS["m"]):
        out.append("".join(t.text or "" for t in si.iter("{%s}t" % NS["m"])))
    return out


def cell_str(cells, sst, row, col):
    t, v = cells.get((row, col), (None, None))
    if v is None:
        return None
    return sst[int(v)] if t == "s" else v


def cell_num(cells, row, col):
    t, v = cells.get((row, col), (None, None))
    if v is None or t == "s":
        return None
    try:
        return float(v)
    except ValueError:
        return None  # '#N/A' error cells -> NULL (R reads them as NA)


def serial_to_date(serial):
    # Excel 1900 date system (with the Lotus leap-year bug baked into the
    # 1899-12-30 epoch convention).
    return datetime.date(1899, 12, 30) + datetime.timedelta(days=int(serial))


def main():
    z = zipfile.ZipFile(XLSX)
    sst = shared_strings(z)
    # workbook sheet order: Monthly Data=sheet1, US GDP=rId3, FRED=rId4
    rels = {r.get("Id"): r.get("Target")
            for r in ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))}
    wb = ET.fromstring(z.read("xl/workbook.xml"))
    sheet_path = {}
    for sh in wb.iter("{%s}sheet" % NS["m"]):
        rid = sh.get("{http://schemas.openxmlformats.org/officeDocument/2006/relationships}id")
        sheet_path[sh.get("name")] = "xl/" + rels[rid].lstrip("/")

    fred = load_sheet(z, sheet_path["FRED"])
    monthly = load_sheet(z, sheet_path["Monthly Data"])
    gdp = load_sheet(z, sheet_path["US GDP"])

    # Header: FRED A1:EQ1 (147 names, first is the date column '1date').
    raw_names = [cell_str(fred, sst, 1, c) for c in range(1, 148)]
    assert all(raw_names), "missing header names"
    seen, names = {}, []
    for n in raw_names:
        if n in seen:
            seen[n] += 1
            names.append(f"{n}_{seen[n]}")
        else:
            seen[n] = 1
            names.append(n)
    series_names = names[1:]  # drop the date header ('1date')

    # Monthly data A12:EQ707.
    dates, cols = [], {n: [] for n in series_names}
    for r in range(12, 708):
        serial = cell_num(monthly, r, 1)
        assert serial is not None, f"missing date at row {r}"
        dates.append(serial_to_date(serial))
        for ci, n in enumerate(series_names, start=2):
            cols[n].append(cell_num(monthly, r, ci))
    table = pa.table(
        {"date": pa.array(dates, pa.date32()),
         **{n: pa.array(cols[n], pa.float64()) for n in series_names}})
    pq.write_table(table, f"{OUT}/monthly_panel.parquet")

    # GDP A56:B287 with the %Y-%d-%m transposition quirk.
    gdates, gvals = [], []
    for r in range(56, 288):
        t, v = gdp.get((r, 1), (None, None))
        if t == "s":
            raw = sst[int(v)]
        elif v is not None:
            raw = serial_to_date(float(v)).isoformat()
        else:
            raise SystemExit(f"missing GDP date at row {r}")
        y, dd, mm = raw.split("-")  # rendered %Y-%d-%m (Main.R:47)
        d = datetime.date(int(y), int(mm), int(dd))
        # Normalize to quarter start (FIXTURES.md §1.2).
        gdates.append(datetime.date(d.year, 3 * ((d.month - 1) // 3) + 1, 1))
        gvals.append(cell_num(gdp, r, 2))
    pq.write_table(
        pa.table({"date": pa.array(gdates, pa.date32()),
                  "GDP": pa.array(gvals, pa.float64())}),
        f"{OUT}/gdp_quarterly.parquet")

    # Currency-unit name ranges CW1:DA1, DK1:EB1, ED1:EP1 (Main.R:58-60),
    # read against the UNIQUIFIED names so they match panel columns.
    cur = []
    for lo, hi in [("DK", "EB"), ("ED", "EP"), ("CW", "DA")]:
        for c in range(col_to_idx(lo), col_to_idx(hi) + 1):
            cur.append(names[c - 1])
    with open(f"{OUT}/currency_names.txt", "w") as f:
        f.write("\n".join(cur) + "\n")

    print(json.dumps({
        "monthly_rows": len(dates), "monthly_cols": len(series_names) + 1,
        "monthly_span": [dates[0].isoformat(), dates[-1].isoformat()],
        "gdp_rows": len(gdates),
        "gdp_span": [gdates[0].isoformat(), gdates[-1].isoformat()],
        "gdp_first_last": [gvals[0], gvals[-1]],
        "dup_names": [n for n in names if n.endswith("_2")],
        "n_currency": len(cur)}))


if __name__ == "__main__":
    import os
    os.makedirs(OUT, exist_ok=True)
    sys.exit(main())
