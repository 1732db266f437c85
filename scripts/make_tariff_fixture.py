"""Regenerate fixtures/tariffs.xlsx from the canonical row list.

Run from the repo root: ``python scripts/make_tariff_fixture.py``.
The oracle for q_scan_xlsx is built from the same TARIFF_FIXTURE_ROWS,
so the checked-in fixture and the oracle can never drift silently.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from smart_energy_consumption_analytics_using_big_data_spark.plans.core import TARIFF_FIXTURE_ROWS
from smart_energy_consumption_analytics_using_big_data_spark.sources.xlsx import write_xlsx

if __name__ == "__main__":
    out = Path(__file__).resolve().parents[1] / "fixtures" / "tariffs.xlsx"
    pdf = pd.DataFrame(TARIFF_FIXTURE_ROWS, columns=["TariffDateTime", "Tariff"])
    write_xlsx(str(out), pdf, sheet_name="Tariffs")
    print(f"wrote {out} ({len(pdf)} rows)")
