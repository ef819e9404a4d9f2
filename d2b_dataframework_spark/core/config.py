"""Config sidecars: explicit-schema CSV + credentials lookup + token
store (SURVEY §1.3, §2.1 S32, §2.2 K6).

Reference semantics (d2b_data/utils.py, Google_Token_MNG.py):

- ``schema.csv`` with headers ``name,type,description`` — Spanish
  aliases ``nombre/tipo/descrip`` accepted — parses into a warehouse
  schema list; types upper-cased, descriptions ASCII-folded; an absent
  file means "autodetect schema" (utils.py:11-63, fallback :61).
- Malformed rows (empty / too short) are skipped, not fatal (P12,
  utils.py:97-99).
- Credentials CSV ``Nombre,project_id,JSON``: find the client row,
  validate the project id, write the JSON blob to a temp file and
  return its path (S32, utils.py:65-130).
- Token JSON files are saved/loaded per service (K6,
  tiktok_marketing.py:221-226, X_ads.py:310-321, Google_Token_MNG.py:54-70).

All driver-side — config never touches executors.
"""

from __future__ import annotations

import csv
import json
import os
import tempfile
from dataclasses import dataclass

from d2b_dataframework_spark.functions.colnames import ascii_fold

_HEADER_ALIASES = {
    "name": "name", "nombre": "name",
    "type": "type", "tipo": "type",
    "description": "description", "descrip": "description", "descripcion": "description",
}

# BigQuery type name → Spark DDL type (for schema enforcement on write).
_BQ_TO_SPARK = {
    "STRING": "string", "INTEGER": "bigint", "INT64": "bigint",
    "FLOAT": "double", "FLOAT64": "double", "NUMERIC": "decimal(38,9)",
    "BOOLEAN": "boolean", "BOOL": "boolean", "DATE": "date",
    "DATETIME": "timestamp", "TIMESTAMP": "timestamp",
}


@dataclass
class SchemaField:
    name: str
    type: str  # upper-cased warehouse type name
    description: str

    @property
    def spark_type(self) -> str:
        return _BQ_TO_SPARK.get(self.type, "string")


def load_schema_csv(path: str) -> list[SchemaField] | None:
    """S32 schema sidecar: absent file → None (autodetect); malformed
    rows skipped (P12)."""
    if not os.path.exists(path):
        return None
    out: list[SchemaField] = []
    with open(path, newline="", encoding="utf-8") as fh:
        reader = csv.reader(fh)
        header = next(reader, None)
        if header is None:
            return []
        cols = [_HEADER_ALIASES.get(h.strip().lower()) for h in header]
        for row in reader:
            if not row or len([c for c in row if c.strip()]) < 2:
                continue  # P12: skip empty/short rows
            rec = {c: v.strip() for c, v in zip(cols, row) if c}
            if not rec.get("name") or not rec.get("type"):
                continue
            out.append(
                SchemaField(
                    name=rec["name"],
                    type=rec["type"].upper(),
                    description=ascii_fold(rec.get("description", "")),
                )
            )
    return out


def schema_ddl(fields: list[SchemaField]) -> str:
    """Schema list → Spark DDL string (the enforcement hook for K2-style
    explicit-schema writes)."""
    return ", ".join(f"`{f.name}` {f.spark_type}" for f in fields)


def extract_and_write_temp_credentials(
    csv_path: str,
    client_name: str,
    project_id: str,
    out_dir: str | None = None,
) -> str:
    """S32: find the client row in a ``Nombre,project_id,JSON`` CSV,
    validate the project id, write the JSON to a temp file, return its
    path (utils.py:65-130). ASCII-folded, case-insensitive client match
    (the reference folds names with unidecode, utils.py:110)."""
    wanted = ascii_fold(client_name).strip().lower()
    with open(csv_path, newline="", encoding="utf-8") as fh:
        reader = csv.reader(fh)
        header = next(reader, None)
        for row in reader:
            if len(row) < 3:
                continue  # P12
            name, proj, blob = row[0], row[1], ",".join(row[2:])
            if ascii_fold(name).strip().lower() != wanted:
                continue
            if proj.strip() != project_id:
                raise ValueError(
                    f"client {client_name!r} found but project_id mismatch: "
                    f"csv={proj.strip()!r} requested={project_id!r}"
                )
            creds = json.loads(blob)
            fd, path = tempfile.mkstemp(
                suffix=".json", prefix="creds_", dir=out_dir
            )
            with os.fdopen(fd, "w", encoding="utf-8") as out:
                json.dump(creds, out)
            return path
    raise ValueError(f"client {client_name!r} not found in {csv_path}")


class TokenStore:
    """K6: per-service token JSON persistence (save/load/refresh hook)."""

    def __init__(self, directory: str):
        self.directory = directory
        os.makedirs(directory, exist_ok=True)

    def _path(self, service: str) -> str:
        return os.path.join(self.directory, f"{service}_token.json")

    def save(self, service: str, token: dict) -> str:
        path = self._path(service)
        with open(path, "w", encoding="utf-8") as fh:
            json.dump(token, fh)
        return path

    def load(self, service: str) -> dict | None:
        path = self._path(service)
        if not os.path.exists(path):
            return None
        with open(path, encoding="utf-8") as fh:
            return json.load(fh)
