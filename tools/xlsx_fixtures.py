#!/usr/bin/env python3
"""Convert the reference repo's .xlsx inputs/goldens to parquet fixtures.

The sandbox has no openpyxl/xlrd, so this parses the xlsx zip XML
directly (sheet1 + sharedStrings). Output goes to
src/test/resources/fixtures/ and is consumed by GoldenParitySpec, which
replays the reference pipeline (E1 price update + E2 KPI) on the REAL
reference data and asserts the committed golden numbers.

Run from the repo root:  python3 tools/xlsx_fixtures.py
"""
import json
import os
import zipfile
import xml.etree.ElementTree as ET

import pyarrow as pa
import pyarrow.parquet as pq

REF = "/root/reference"
OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src", "test", "resources", "fixtures")
NS = {"m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main"}


def col_index(ref):
    """'BC12' -> 0-based column index 54."""
    acc = 0
    for ch in ref:
        if ch.isalpha():
            acc = acc * 26 + (ord(ch.upper()) - ord("A") + 1)
        else:
            break
    return acc - 1


def read_sheet(path):
    """Return (headers, rows) of sheet1; cells as raw strings, None for
    missing. Duplicate headers deduped pandas-style (name, name_2, ...).
    """
    z = zipfile.ZipFile(path)
    shared = []
    if "xl/sharedStrings.xml" in z.namelist():
        sroot = ET.fromstring(z.read("xl/sharedStrings.xml"))
        for si in sroot.findall("m:si", NS):
            shared.append("".join(t.text or "" for t in si.findall(".//m:t", NS)))

    def cellval(c):
        t = c.get("t")
        if t == "inlineStr":
            return "".join(tt.text or "" for tt in c.findall(".//m:t", NS))
        v = c.find("m:v", NS)
        if v is None or v.text is None:
            return None
        return shared[int(v.text)] if t == "s" else v.text

    sheet = ET.fromstring(z.read("xl/worksheets/sheet1.xml"))
    raw = []
    width = 0
    for row in sheet.findall(".//m:row", NS):
        cells = {}
        for c in row.findall("m:c", NS):
            idx = col_index(c.get("r"))
            cells[idx] = cellval(c)
            width = max(width, idx + 1)
        raw.append(cells)
    headers, seen = [], set()
    for i in range(width):
        name = (raw[0].get(i) or f"col_{i}").strip()
        if name in seen:
            k = 2
            while f"{name}_{k}" in seen:
                k += 1
            name = f"{name}_{k}"
        seen.add(name)
        headers.append(name)
    rows = [[cells.get(i) for i in range(width)] for cells in raw[1:]]
    return headers, rows


def to_table(headers, rows, doubles=(), longs=()):
    cols = {}
    for i, h in enumerate(headers):
        vals = [r[i] for r in rows]
        if h in doubles:
            cols[h] = pa.array(
                [None if v in (None, "") else float(v) for v in vals],
                type=pa.float64())
        elif h in longs:
            cols[h] = pa.array(
                [None if v in (None, "") else int(float(v)) for v in vals],
                type=pa.int64())
        else:
            cols[h] = pa.array(vals, type=pa.string())
    return pa.table(cols)


def main():
    os.makedirs(OUT, exist_ok=True)

    # --- CRM extract (E1 right side). `_row` = load ordinal for the
    # reference's keep-last duplicate resolution (no fecha col exists).
    h, rows = read_sheet(f"{REF}/data_sperant_actual/BD_SPERANT_ACTUAL.xlsx")
    t = to_table(h, rows, doubles=("precio_lista", "Precio_Final"))
    t = t.append_column("_row", pa.array(range(len(rows)), type=pa.int64()))
    pq.write_table(t, f"{OUT}/sperant_actual.parquet")
    print("sperant_actual:", t.num_rows, t.column_names)

    # --- Updated Matera output (E1 golden "after" table). All strings —
    # the raw-sheet reading semantics the pipeline ingests.
    h, rows = read_sheet(f"{REF}/tablas_actualizadas/Matera.xlsx")
    t = to_table(h, rows)
    pq.write_table(t, f"{OUT}/matera_updated.parquet")
    print("matera_updated:", t.num_rows, t.column_names)

    # --- Changed-rows detail golden (also reconstructs the INPUT: the
    # *_Antes columns are the pre-update values for every row).
    h, rows = read_sheet(
        f"{REF}/tablas_actualizadas/Auditoria/Detalle_cambios_Matera.xlsx")
    t = to_table(h, rows,
                 doubles=("Precio de lista_Antes", "_precio_num_Antes",
                          "Precio de lista_Despues"),
                 longs=("_rowid",))
    pq.write_table(t, f"{OUT}/matera_detalle_golden.parquet")
    print("matera_detalle_golden:", t.num_rows, t.column_names)

    # --- Per-project audit resumen golden.
    h, rows = read_sheet(
        f"{REF}/tablas_actualizadas/Auditoria/Resumen_cambios_por_proyecto.xlsx")
    longs = ("Registros", "Con_Match", "Sin_Match", "Cambios",
             "Cambios_Precio", "Cambios_Estado", "Sin_Cambio")
    doubles = tuple(c for c in h if c.startswith("%_"))
    t = to_table(h, rows, doubles=doubles, longs=longs)
    pq.write_table(t, f"{OUT}/resumen_golden.parquet")
    print("resumen_golden:", t.num_rows, t.column_names)

    # --- E2 KPI golden (computed by the reference on the pre-update
    # sheets; Matera's node is reproducible from the reconstructed input).
    with open(f"{REF}/html_con_datos/kpis.json", encoding="utf-8") as f:
        kpis = json.load(f)
    with open(f"{OUT}/kpis_golden.json", "w", encoding="utf-8") as f:
        json.dump(kpis, f, ensure_ascii=False, indent=2)
    print("kpis_golden: cards", kpis["cards"])


if __name__ == "__main__":
    main()
