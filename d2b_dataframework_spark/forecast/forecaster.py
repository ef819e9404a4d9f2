"""Distributed per-metric time-series forecasting (SURVEY §2.8 M1–M6).

Reference semantics (d2b_data/ProphetForecaster.py):

- ``forecast(df, days, …)``: detect the date column (``date`` or
  ``fecha``, none ⇒ error — P13, :36,70-73); metrics = all non-date,
  non-regressor columns with a STRICT numeric dtype check (P14,
  :75-101); values coerced via ``to_numeric(errors='coerce')`` (F9,
  :107-110).
- Per metric: rename to ``y``, fit, build a future frame (``days``,
  ``freq``, ``include_history``), predict, rename ``yhat`` → metric
  (M1, :367-399).
- Config surface (M2, :267-361): growth linear/logistic/flat, cap/floor
  scalar or per-metric dict (:145-150,370-371), seasonality mode/priors,
  changepoints, holidays, country holidays, custom seasonalities,
  regressors, interval width, passthrough kwargs.
- ``include_intervals`` ⇒ ``{metric}_lower/_upper`` columns (M3,
  :221-235); external regressors join onto the future frame after
  dedup-keep-last, any null future regressor ⇒ error (M4, :171-208);
  results outer-merged on date, sorted, rounded (default 0 decimals,
  ``None`` disables — F12, :237-248), clipped at 0 when requested (F11,
  :230-233).
- Models pickled per metric; load subset; missing file warns (M5,
  :405-473). Heavy import happens lazily inside the fit path (M6,
  :118-128).

Spark shape (SURVEY §3 E4): metrics go LONG (one row per metric×date via
stack), then ``groupBy("metric").applyInPandas(fit_predict)`` — one task
per series, horizontally scalable to millions of series by widening the
group key (e.g. entity×metric). The wide result comes back via pivot.

Backend: ``prophet`` is imported lazily INSIDE the UDF (executor-side,
M6); when unavailable (as in this container) a deterministic
closed-form fallback fits trend (OLS) + weekly seasonality (per-weekday
mean residual) with residual-std intervals — same output contract, fully
testable offline.
"""

from __future__ import annotations

import math
import os
import pickle
import warnings
from dataclasses import dataclass, field
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

DATE_ALIASES = ("date", "fecha")  # P13: ProphetForecaster.py:36,70-73

_LONG_SCHEMA = StructType(
    [
        StructField("metric", StringType()),
        StructField("ds", TimestampType()),
        StructField("yhat", DoubleType()),
        StructField("yhat_lower", DoubleType()),
        StructField("yhat_upper", DoubleType()),
    ]
)


@dataclass
class ForecastConfig:
    """M2: the reference's forecast parameter surface
    (ProphetForecaster.py:267-361)."""

    days: int = 30
    freq: str = "D"
    include_history: bool = False
    growth: str = "linear"  # linear | logistic | flat
    cap: float | dict[str, float] | None = None
    floor: float | dict[str, float] | None = None
    seasonality_mode: str = "additive"
    changepoint_prior_scale: float = 0.05
    seasonality_prior_scale: float = 10.0
    holidays: list[dict] | None = None
    country_holidays: str | None = None
    custom_seasonalities: list[dict] = field(default_factory=list)
    regressors: list[str] = field(default_factory=list)
    interval_width: float = 0.8
    include_intervals: bool = False
    clip_negative: bool = False
    round_decimals: int | None = 0
    backend: str = "auto"  # auto | prophet | ols
    prophet_kwargs: dict[str, Any] = field(default_factory=dict)

    def metric_cap(self, metric: str) -> float | None:
        """Per-metric cap dict or scalar (ProphetForecaster.py:145-150)."""
        if isinstance(self.cap, dict):
            return self.cap.get(metric)
        return self.cap

    def metric_floor(self, metric: str) -> float | None:
        if isinstance(self.floor, dict):
            return self.floor.get(metric)
        return self.floor


class OLSSeasonalModel:
    """Deterministic fallback backend: OLS linear trend + per-weekday
    mean residual (weekly seasonality, daily freq only) + residual-std
    intervals. Flat growth = intercept-only; logistic/linear caps apply
    as clips. Fully closed-form → reproducible across runs/engines."""

    def __init__(self, config: ForecastConfig, metric: str):
        self.config = config
        self.metric = metric
        self.params: dict[str, Any] = {}
        self.history: pd.DataFrame | None = None
        self.extra_regressors: list[str] = list(config.regressors)

    def fit(self, history: pd.DataFrame) -> "OLSSeasonalModel":
        hist = history.dropna(subset=["y"]).reset_index(drop=True)
        self.history = hist
        x = (hist["ds"] - hist["ds"].min()).dt.total_seconds() / 86400.0
        y = hist["y"].astype(float)
        n = len(hist)
        if n == 0:
            raise ValueError(f"metric {self.metric}: no rows to fit")
        if self.config.growth == "flat" or n == 1:
            slope, intercept = 0.0, float(y.mean())
        else:
            sx, sy = float(x.sum()), float(y.sum())
            sxx, sxy = float((x * x).sum()), float((x * y).sum())
            denom = n * sxx - sx * sx
            slope = (n * sxy - sx * sy) / denom if denom else 0.0
            intercept = sy / n - slope * (sx / n)
        resid = y - (intercept + slope * x)
        # Regressors: one-pass per-regressor OLS on the residual.
        reg_coefs = {}
        for reg in self.extra_regressors:
            r = hist[reg].astype(float)
            rc = r - r.mean()
            var = float((rc * rc).sum())
            reg_coefs[reg] = float((rc * resid).sum()) / var if var else 0.0
            resid = resid - reg_coefs[reg] * rc
        # Weekly seasonality on what's left (daily data, ≥2 weeks).
        weekday_effect = {}
        if self.config.freq == "D" and n >= 14:
            weekday_effect = resid.groupby(hist["ds"].dt.weekday).mean().to_dict()
            resid = resid - hist["ds"].dt.weekday.map(weekday_effect).fillna(0.0)
        sd = float(resid.std(ddof=1)) if n > 2 else 0.0
        z = _z_for(self.config.interval_width)
        self.params = {
            "slope": slope,
            "intercept": intercept,
            "ds0": hist["ds"].min(),
            "ds_last": hist["ds"].max(),
            "weekday_effect": weekday_effect,
            "reg_coefs": reg_coefs,
            "reg_means": {r: float(hist[r].astype(float).mean()) for r in self.extra_regressors},
            "half_interval": z * sd,
        }
        return self

    def predict(self, future: pd.DataFrame) -> pd.DataFrame:
        p = self.params
        x = (future["ds"] - p["ds0"]).dt.total_seconds() / 86400.0
        yhat = p["intercept"] + p["slope"] * x
        for reg, coef in p["reg_coefs"].items():
            yhat = yhat + coef * (future[reg].astype(float) - p["reg_means"][reg])
        if p["weekday_effect"]:
            yhat = yhat + future["ds"].dt.weekday.map(p["weekday_effect"]).fillna(0.0)
        cap = self.config.metric_cap(self.metric)
        floor = self.config.metric_floor(self.metric)
        if self.config.growth == "logistic":
            if cap is not None:
                yhat = yhat.clip(upper=cap)
            if floor is not None:
                yhat = yhat.clip(lower=floor)
        out = pd.DataFrame(
            {
                "ds": future["ds"],
                "yhat": yhat,
                "yhat_lower": yhat - p["half_interval"],
                "yhat_upper": yhat + p["half_interval"],
            }
        )
        return out


def _z_for(interval_width: float) -> float:
    """Two-sided normal quantile via inverse-erf (no scipy)."""
    from statistics import NormalDist

    return NormalDist().inv_cdf(0.5 + interval_width / 2.0)


def _fit_prophet(pdf: pd.DataFrame, config: ForecastConfig, metric: str):
    """M6: lazy executor-side import; silence prophet's loggers."""
    import logging

    from prophet import Prophet  # noqa: PLC0415

    logging.getLogger("prophet").setLevel(logging.WARNING)
    logging.getLogger("cmdstanpy").setLevel(logging.WARNING)
    kwargs = dict(
        growth=config.growth if config.growth != "flat" else "flat",
        seasonality_mode=config.seasonality_mode,
        changepoint_prior_scale=config.changepoint_prior_scale,
        seasonality_prior_scale=config.seasonality_prior_scale,
        interval_width=config.interval_width,
        **config.prophet_kwargs,
    )
    if config.holidays:
        kwargs["holidays"] = pd.DataFrame(config.holidays)
    m = Prophet(**kwargs)
    if config.country_holidays:
        m.add_country_holidays(country_name=config.country_holidays)
    for seas in config.custom_seasonalities:
        m.add_seasonality(**seas)
    for reg in config.regressors:
        m.add_regressor(reg)
    fit_df = pdf.rename(columns={"y": "y"})
    cap, floor = config.metric_cap(metric), config.metric_floor(metric)
    if config.growth == "logistic":
        fit_df = fit_df.assign(cap=cap, floor=floor if floor is not None else 0.0)
    m.fit(fit_df)
    return m


def detect_date_column(columns: list[str]) -> str:
    """P13: first column named ``date``/``fecha`` is the time axis
    (ProphetForecaster.py:36,70-73)."""
    for c in columns:
        if c.lower() in DATE_ALIASES:
            return c
    raise ValueError(
        f"no date column found (expected one of {DATE_ALIASES}); got {columns}"
    )


def select_metrics(df: DataFrame, date_col: str, regressors: list[str]) -> list[str]:
    """P14: metrics = all non-date, non-regressor NUMERIC columns; a
    non-numeric candidate is a hard error (ProphetForecaster.py:75-101)."""
    from pyspark.sql.types import NumericType

    metrics = []
    for f_ in df.schema.fields:
        if f_.name == date_col or f_.name in regressors:
            continue
        if not isinstance(f_.dataType, NumericType):
            raise TypeError(
                f"metric column {f_.name!r} is {f_.dataType.simpleString()}, not numeric"
            )
        metrics.append(f_.name)
    if not metrics:
        raise ValueError("no numeric metric columns to forecast")
    return metrics


def _make_future(
    history: pd.DataFrame, config: ForecastConfig
) -> pd.DataFrame:
    last = history["ds"].max()
    future_ds = pd.date_range(
        last, periods=config.days + 1, freq=config.freq, inclusive="right"
    )
    if config.include_history:
        ds = pd.concat([history["ds"], pd.Series(future_ds)], ignore_index=True)
    else:
        ds = pd.Series(future_ds)
    return pd.DataFrame({"ds": ds})


def _join_future_regressors(
    future: pd.DataFrame,
    history: pd.DataFrame,
    future_regressors: pd.DataFrame | None,
    regressors: list[str],
    metric: str,
) -> pd.DataFrame:
    """M4: history ∪ future regressor values, dedup keep-last on ds, left
    join; any null future regressor ⇒ error (ProphetForecaster.py:184-208)."""
    if not regressors:
        return future
    frames = [history[["ds", *regressors]]]
    if future_regressors is not None:
        frames.append(future_regressors[["ds", *regressors]])
    reg = (
        pd.concat(frames, ignore_index=True)
        .sort_values("ds", kind="stable")
        .drop_duplicates(subset="ds", keep="last")
    )
    out = future.merge(reg, on="ds", how="left")
    missing = out[regressors].isna().any(axis=1)
    if missing.any():
        bad = out.loc[missing, "ds"].iloc[0]
        raise ValueError(
            f"metric {metric}: regressor values missing for future date {bad}"
        )
    return out


def _use_prophet(config: ForecastConfig) -> bool:
    if config.backend == "ols":
        return False
    try:
        import prophet  # noqa: F401, PLC0415

        return True
    except ImportError:
        if config.backend == "prophet":
            raise
        return False


def forecast(
    df: DataFrame,
    config: ForecastConfig | None = None,
    future_regressors: DataFrame | None = None,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """M1: distributed per-metric (×group) fit+predict.

    Input: wide frame with a date column (P13), numeric metric columns
    (P14), optional regressor columns and extra ``group_cols`` (entity
    keys — the scale axis: one Spark task per (group, metric) series).
    Output: wide frame ``date, [group_cols,] {metric}[, {metric}_lower,
    {metric}_upper]`` sorted by date (D5), rounded (F12), clipped (F11).
    """
    config = config or ForecastConfig()
    group_cols = group_cols or []
    date_col = detect_date_column(df.columns)
    metrics = select_metrics(
        df, date_col, [*config.regressors, *group_cols]
    )

    # Wide → long: one row per (group, metric, ds); F9 numeric coercion.
    stack_expr = ", ".join(f"'{m}', cast(`{m}` as double)" for m in metrics)
    long_df = df.select(
        F.to_timestamp(F.col(date_col)).alias("ds"),
        *[F.col(c) for c in group_cols],
        *[F.col(r).cast("double").alias(r) for r in config.regressors],
        F.expr(f"stack({len(metrics)}, {stack_expr}) as (metric, y)"),
    )

    freg_pdf = None
    if future_regressors is not None:
        freg_pdf = future_regressors.toPandas()
        freg_pdf["ds"] = pd.to_datetime(freg_pdf[detect_date_column(list(freg_pdf.columns))])

    out_schema = StructType(
        [*[df.schema[c] for c in group_cols], *_LONG_SCHEMA.fields]
    )
    regressors = list(config.regressors)

    def fit_predict(pdf: pd.DataFrame) -> pd.DataFrame:
        metric = pdf["metric"].iloc[0]
        keys = {c: pdf[c].iloc[0] for c in group_cols}
        history = (
            pdf.dropna(subset=["y"])
            .sort_values("ds", kind="stable")
            .drop_duplicates(subset="ds", keep="last")  # D2
            .reset_index(drop=True)
        )
        future = _make_future(history, config)
        future = _join_future_regressors(
            future, history, freg_pdf, regressors, metric
        )
        if _use_prophet(config):
            model = _fit_prophet(history, config, metric)
            cap = config.metric_cap(metric)
            if config.growth == "logistic":
                future = future.assign(
                    cap=cap, floor=config.metric_floor(metric) or 0.0
                )
            pred = model.predict(future)[["ds", "yhat", "yhat_lower", "yhat_upper"]]
        else:
            model = OLSSeasonalModel(config, metric).fit(history)
            pred = model.predict(future)
        pred.insert(0, "metric", metric)
        for c, v in reversed(keys.items()):
            pred.insert(0, c, v)
        return pred

    long_out = long_df.groupBy(*group_cols, "metric").applyInPandas(
        fit_predict, out_schema
    )
    return _wide_format(long_out, metrics, config, group_cols)


def _wide_format(
    long_out: DataFrame,
    metrics: list[str],
    config: ForecastConfig,
    group_cols: list[str],
) -> DataFrame:
    """Long predictions → the reference's output shape: one date row with
    {metric}[, _lower/_upper] columns (outer-merge analog J4 via pivot),
    sorted by date (D5), clipped (F11), rounded (F12)."""
    aggs = []
    for m in metrics:
        aggs.append(
            F.first(F.when(F.col("metric") == m, F.col("yhat")), ignorenulls=True).alias(m)
        )
        if config.include_intervals:
            aggs.append(
                F.first(
                    F.when(F.col("metric") == m, F.col("yhat_lower")), ignorenulls=True
                ).alias(f"{m}_lower")
            )
            aggs.append(
                F.first(
                    F.when(F.col("metric") == m, F.col("yhat_upper")), ignorenulls=True
                ).alias(f"{m}_upper")
            )
    wide = (
        long_out.groupBy(*group_cols, F.col("ds").alias("date"))
        .agg(*aggs)
        .orderBy(*group_cols, "date")
    )
    out_cols = [c for c in wide.columns if c not in ("date", *group_cols)]
    if config.clip_negative:
        wide = wide.withColumns(
            {c: F.greatest(F.col(c), F.lit(0.0)) for c in out_cols}
        )
    if config.round_decimals is not None:
        wide = wide.withColumns(
            {c: F.round(F.col(c), config.round_decimals) for c in out_cols}
        )
    return wide


# ---------------------------------------------------------------------------
# M5: model persistence
# ---------------------------------------------------------------------------


def fit_models(
    df: DataFrame,
    config: ForecastConfig | None = None,
    max_driver_rows: int = 1_000_000,
) -> dict[str, OLSSeasonalModel]:
    """Driver-side fit of one model per metric (the persistence path —
    the distributed path re-fits inside the UDF; model objects only need
    to exist driver-side for save/load parity, ProphetForecaster.py:405-473).

    This path intentionally collects the frame to the driver (a daily
    time series is a few thousand rows). ``max_driver_rows`` bounds the
    pull: the collect reads at most ``max_driver_rows + 1`` rows and
    raises ``ValueError`` if the frame exceeds the bound, so a caller
    cannot silently point it at a corpus-sized frame — use the
    distributed ``forecast()`` operator for anything bigger.
    """
    config = config or ForecastConfig()
    date_col = detect_date_column(df.columns)
    metrics = select_metrics(df, date_col, config.regressors)
    pdf = df.limit(max_driver_rows + 1).toPandas()
    if len(pdf) > max_driver_rows:
        raise ValueError(
            f"fit_models collects to the driver and got more than "
            f"max_driver_rows={max_driver_rows} rows; aggregate the frame "
            "first or use the distributed forecast() operator"
        )
    pdf["ds"] = pd.to_datetime(pdf[date_col])
    out = {}
    for m in metrics:
        hist = pdf[["ds", *config.regressors]].assign(y=pd.to_numeric(pdf[m], errors="coerce"))
        out[m] = OLSSeasonalModel(config, m).fit(hist)
    return out


def save_models(models: dict[str, OLSSeasonalModel], directory: str) -> list[str]:
    """One ``{metric}_model.pkl`` per model (ProphetForecaster.py:405-437)."""
    os.makedirs(directory, exist_ok=True)
    paths = []
    for metric, model in models.items():
        path = os.path.join(directory, f"{metric}_model.pkl")
        with open(path, "wb") as fh:
            pickle.dump(
                {"metric": metric, "params": model.params,
                 "config": model.config.__dict__,
                 "extra_regressors": model.extra_regressors},
                fh,
            )
        paths.append(path)
    return paths


def load_models(
    directory: str, metrics: list[str] | None = None
) -> dict[str, OLSSeasonalModel]:
    """Load all (or a subset of) saved models; a missing file warns and
    skips (ProphetForecaster.py:439-473)."""
    out: dict[str, OLSSeasonalModel] = {}
    wanted = metrics
    if wanted is None:
        wanted = [
            f[: -len("_model.pkl")]
            for f in sorted(os.listdir(directory))
            if f.endswith("_model.pkl")
        ]
    for metric in wanted:
        path = os.path.join(directory, f"{metric}_model.pkl")
        if not os.path.exists(path):
            warnings.warn(f"no saved model for metric {metric!r} at {path}", stacklevel=2)
            continue
        with open(path, "rb") as fh:
            blob = pickle.load(fh)
        model = OLSSeasonalModel(ForecastConfig(**blob["config"]), metric)
        model.params = blob["params"]
        model.extra_regressors = blob["extra_regressors"]
        out[metric] = model
    return out


def predict_from_loaded(
    models: dict[str, OLSSeasonalModel],
    days: int,
    freq: str = "D",
    future_regressors: pd.DataFrame | None = None,
) -> pd.DataFrame:
    """M5 re-predict: horizon from each model's stored state
    (cap/regressors re-derived from the model, ProphetForecaster.py:475-524)."""
    frames = []
    for metric, model in models.items():
        # Anchor at the END of history (the reference builds futures from
        # make_future_dataframe, i.e. past the last observed date); ds0
        # only as a fallback for pickles saved before ds_last existed.
        last = model.params.get("ds_last", model.params["ds0"])
        future_ds = pd.date_range(last, periods=days + 1, freq=freq, inclusive="right")
        future = pd.DataFrame({"ds": future_ds})
        for reg in model.extra_regressors:
            if future_regressors is None or reg not in future_regressors:
                raise ValueError(f"metric {metric}: regressor {reg} required")
            future[reg] = future_regressors[reg].values[: len(future)]
        pred = model.predict(future)[["ds", "yhat"]].rename(columns={"yhat": metric})
        frames.append(pred.set_index("ds"))
    out = pd.concat(frames, axis=1, join="outer").reset_index().sort_values("ds")
    return out.rename(columns={"ds": "date"}).reset_index(drop=True)
