"""In-code fixtures (FIXTURES.md §B): the reference's Titanic schema with
a deterministic 6-row base + 2 manufactured rows, used to replay the
reference's whole mutation scenario (sparkcode/titanic_example_delta.py:25-70)
in tests and driver queries."""

from __future__ import annotations

from pucminas_data_pipelines_spark.schemas import TITANIC_DDL  # noqa: F401

# Base table — stands in for the Titanic CSV scan (reference O4).
TITANIC_BASE_ROWS: list[tuple] = [
    (1, 0, 3, "Braund, Mr. Owen Harris", "male", 22.0, 1, 0, "A/5 21171", 7.25, None, "S"),
    (2, 1, 1, "Cumings, Mrs. John Bradley", "female", 38.0, 1, 0, "PC 17599", 71.2833, "C85", "C"),
    (3, 1, 3, "Heikkinen, Miss. Laina", "female", 26.0, 0, 0, "STON/O2. 3101282", 7.925, None, "S"),
    (4, 1, 1, "Futrelle, Mrs. Jacques Heath", "female", 35.0, 1, 0, "113803", 53.1, "C123", "S"),
    (5, 0, 3, "Allen, Mr. William Henry", "male", 35.0, 0, 0, "373450", 8.05, None, "S"),
    (6, 0, 3, "Moran, Mr. James", "male", None, 0, 0, "330877", 8.4583, None, "Q"),
]

# Manufactured rows — mirrors reference O8 (keys 892, 893 with None cells,
# sparkcode/titanic_example_delta.py:31-32).
TITANIC_NEW_ROWS: list[tuple] = [
    (892, 1, 1, "Apito, Sr. Jose", "male", 42.0, 0, 0, None, 100.0, None, "S"),
    (893, 1, 2, "Kagga, Sra. Mara", "female", 33.0, 0, 0, None, 80.0, "B42", "C"),
]
