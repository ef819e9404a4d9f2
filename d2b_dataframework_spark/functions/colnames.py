"""Column-name normalization (SURVEY §2.3 P3-P7).

The reference cleans API column names before loading to BigQuery; we
reproduce each scheme as a pure-Python rename map applied via ``toDF``/
``withColumnsRenamed`` (metadata-only — no shuffle, no job).

References:
- BQ-safe cleaning:    d2b_data/Google_Bigquery.py:57-80
- dots→underscores:    d2b_data/youtube_public.py:71-82
- regex scrub:         d2b_data/Linkedin_Marketing.py:80
- leaf-name truncate:  d2b_data/tiktok_marketing.py:388,444
- X ads scrub:         d2b_data/X_ads.py:323-333
"""

from __future__ import annotations

import re
import unicodedata

from pyspark.sql import DataFrame


def ascii_fold(text: str) -> str:
    """Fold accented characters to ASCII (unidecode-lite, F2).

    Covers the Latin repertoire the reference sees (Spanish campaign /
    client names — d2b_data/utils.py:48,110). NFKD-decompose then drop
    combining marks; ñ→n, á→a, ü→u, etc.
    """
    decomposed = unicodedata.normalize("NFKD", text)
    return "".join(c for c in decomposed if not unicodedata.combining(c))


def clean_bq_name(name: str) -> str:
    """BigQuery-safe column name (P3): lower, spaces→_, strip ``ga:``,
    ``&``→_, collapse ``___``→_, fold accents."""
    out = ascii_fold(name).lower()
    out = out.replace("ga:", "")
    out = out.replace(" ", "_").replace("&", "_")
    out = re.sub(r"_{2,}", "_", out)
    return out.strip("_") or name


def clean_dots(name: str) -> str:
    """Dots from json-flattening → underscores (P4)."""
    return name.replace(".", "_")


def clean_regex(name: str) -> str:
    """Strip/lower; whitespace & dashes → _; drop non-word chars (P5)."""
    out = ascii_fold(name).strip().lower()
    out = re.sub(r"[\s\-]+", "_", out)
    out = re.sub(r"[^\w]", "", out)
    return out or name


def leaf_name(name: str) -> str:
    """Keep the last dotted segment (P6). Collision-prone by design;
    use :func:`rename_map` which disambiguates."""
    return name.split(".")[-1]


def clean_x_ads(name: str) -> str:
    """Drop ``./|,`` chars and the ``request_params_`` prefix (P7)."""
    out = re.sub(r"[./|,]", "", name)
    return out.removeprefix("request_params_")


_SCHEMES = {
    "bq": clean_bq_name,
    "dots": clean_dots,
    "regex": clean_regex,
    "leaf": leaf_name,
    "x_ads": clean_x_ads,
}


def rename_map(columns: list[str], scheme: str = "bq") -> dict[str, str]:
    """Build an old→new rename map; suffix ``_2``, ``_3``… on collisions
    (the reference silently collides — we keep every column instead)."""
    fn = _SCHEMES[scheme]
    seen: dict[str, int] = {}
    out: dict[str, str] = {}
    for col in columns:
        new = fn(col)
        count = seen.get(new, 0)
        seen[new] = count + 1
        out[col] = new if count == 0 else f"{new}_{count + 1}"
    return out


def normalize_columns(df: DataFrame, scheme: str = "bq") -> DataFrame:
    """Apply a naming scheme to every column. Metadata-only (no shuffle)."""
    mapping = rename_map(df.columns, scheme)
    return df.toDF(*[mapping[c] for c in df.columns])
