from d2b_dataframework_spark.forecast.forecaster import (  # noqa: F401
    ForecastConfig,
    OLSSeasonalModel,
    detect_date_column,
    fit_models,
    forecast,
    load_models,
    predict_from_loaded,
    save_models,
    select_metrics,
)
