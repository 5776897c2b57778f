"""Model/source documentation — the reference's yml patch files.

dbt keeps descriptions in schema yml files beside the SQL, not in the
models themselves; this module mirrors that split. Each entry
transcribes the reference's documentation verbatim:

- ``models/staging/_staging__models.yml`` (4 staging models)
- ``models/intermediate/_intermediate__models.yml`` (2 intermediates)
- ``models/marts/_marts__models.yml`` (dim/fct/rpt, incl. ``meta``)
- ``models/marts/_python_models.yml`` (the 3 Python-model ports)
- ``models/staging/_sources.yml`` (4 raw sources + table docs)

Consumed by ``cmd_docs`` (manifest.json generation) only — zero runtime
surface. The seed (``country_metadata``) and snapshot
(``snap_gdp_history``) carry no yml documentation in the reference, so
they have no entries here (the manifest still lists them from their
ModelDef).
"""

from __future__ import annotations

# name -> {description, columns: {col: description}, meta: {...}}
MODEL_DOCS: dict[str, dict] = {
    # ---- models/staging/_staging__models.yml ------------------------
    "stg_eurostat__gdp": {
        "description": (
            "Staged GDP data from Eurostat. Contains annual GDP figures "
            "for EU countries in current prices (million EUR)."
        ),
        "columns": {
            "gdp_key": "Surrogate key (hash of country_code + year_code)",
            "country_code": "ISO 2-letter country code",
            "country_name": "Full country name from Eurostat",
            "reference_year": "Reference year as integer",
            "reference_date": "First day of reference year as date",
            "gdp_million_eur": "GDP value in million EUR at current prices",
        },
    },
    "stg_eurostat__unemployment": {
        "description": (
            "Staged unemployment rate data from Eurostat. Contains "
            "monthly seasonally adjusted unemployment rates as "
            "percentage of active population."
        ),
        "columns": {
            "unemployment_key": "Surrogate key (hash of country_code + period_code)",
            "country_code": "ISO 2-letter country code",
            "reference_date": "First day of reference month as date",
            "unemployment_rate_pct": "Unemployment rate as percentage of active population",
        },
    },
    "stg_eurostat__inflation": {
        "description": (
            "Staged HICP inflation data from Eurostat. Contains monthly "
            "month-over-month rate of change for the all-items consumer "
            "price index."
        ),
        "columns": {
            "inflation_key": "Surrogate key (hash of country_code + period_code)",
            "country_code": "ISO 2-letter country code",
            "reference_date": "First day of reference month as date",
            "inflation_rate_mom_pct": "Month-over-month inflation rate as percentage change",
        },
    },
    "stg_eurostat__population": {
        "description": (
            "Staged population data from Eurostat. Contains annual "
            "population counts on 1 January for EU countries."
        ),
        "columns": {
            "population_key": "Surrogate key (hash of country_code + year_code)",
            "country_code": "ISO 2-letter country code",
            "reference_year": "Reference year as integer",
            "population_count": "Total population count",
        },
    },
    # ---- models/intermediate/_intermediate__models.yml --------------
    "int_country_annual_metrics": {
        "description": (
            "Annual economic metrics aggregated by country. Combines "
            "GDP, population, unemployment, and inflation data at the "
            "annual grain. Derived metrics include GDP per capita and "
            "data quality flags."
        ),
        "columns": {
            "annual_metrics_key": "Surrogate key (hash of country_code + reference_year)",
            "country_code": "ISO 2-letter country code",
            "reference_year": "Reference year",
            "gdp_million_eur": "GDP in million EUR at current prices",
            "population_count": "Population count on January 1st",
            "gdp_per_capita_eur": "Calculated GDP per capita in EUR",
            "avg_unemployment_rate_pct": "Average monthly unemployment rate for the year",
            "annual_inflation_rate_pct": "Sum of monthly inflation rates (approximate annual)",
            "has_complete_unemployment_data": "True if all 12 months of unemployment data are present",
            "has_complete_inflation_data": "True if all 12 months of inflation data are present",
        },
    },
    "int_country_monthly_indicators": {
        "description": (
            "Monthly economic indicators with trend analysis. Contains "
            "unemployment and inflation at monthly grain with lag "
            "calculations, year-over-year comparisons, and rolling "
            "averages for time series analysis."
        ),
        "columns": {
            "monthly_metrics_key": "Surrogate key (hash of country_code + reference_date)",
            "country_code": "ISO 2-letter country code",
            "reference_date": "First day of reference month",
            "unemployment_rate_pct": "Monthly unemployment rate",
            "inflation_rate_mom_pct": "Month-over-month inflation rate",
            "unemployment_rate_prev_month": "Previous month's unemployment rate",
            "unemployment_rate_prev_year": "Same month previous year's unemployment rate",
            "unemployment_rate_12m_avg": "12-month rolling average unemployment rate",
            "inflation_rate_12m_avg": "12-month rolling average inflation rate",
        },
    },
    # ---- models/marts/_marts__models.yml ----------------------------
    "dim_country": {
        "description": (
            "Country dimension table containing reference data for EU "
            "member states. Includes EU/Eurozone membership status, "
            "geographic classification, and data availability summary."
        ),
        "columns": {
            "country_key": "Surrogate key for the country",
            "country_code": "ISO 2-letter country code (natural key)",
            "country_name": "Full country name",
            "eu_member_since": "Date of EU accession (null if not a member)",
            "eurozone_member": "Whether the country uses the Euro",
            "region": "Geographic region within Europe",
            "subregion": "Geographic subregion within Europe",
            "eu_status": "Classification: Eurozone, EU (non-Euro), or Non-EU",
            "earliest_gdp_year": "First year of available GDP data",
            "latest_gdp_year": "Most recent year of available GDP data",
            "years_of_gdp_data": "Count of years with GDP data",
            "_loaded_at": "Timestamp when record was loaded",
        },
    },
    "fct_economic_indicators": {
        "description": (
            "Core fact table containing monthly economic indicators by "
            "country. Uses incremental materialization for efficient "
            "processing. Primary table for dashboards and ad-hoc "
            "analysis."
        ),
        "meta": {"owner": "data-engineering", "refresh_frequency": "daily"},
        "columns": {
            "indicator_key": "Primary key (same as monthly_metrics_key from intermediate)",
            "country_code": "ISO 2-letter country code",
            "country_key": "Foreign key to dim_country",
            "reference_year": "Reference year",
            "reference_month": "Reference month (1-12)",
            "reference_date": "First day of the reference month",
            "unemployment_rate_pct": "Monthly unemployment rate (seasonally adjusted)",
            "inflation_rate_mom_pct": "Month-over-month inflation rate (HICP)",
            "unemployment_rate_prev_month": "Previous month unemployment rate",
            "unemployment_rate_prev_year": "Same month previous year unemployment rate",
            "unemployment_rate_12m_avg": "12-month rolling average unemployment rate",
            "inflation_rate_12m_avg": "12-month rolling average inflation rate",
            "unemployment_mom_change": "Month-over-month change in unemployment rate (pp)",
            "unemployment_yoy_change": "Year-over-year change in unemployment rate (pp)",
            "annual_gdp_million_eur": "Annual GDP for context",
            "annual_population_count": "Annual population for context",
            "annual_gdp_per_capita_eur": "Annual GDP per capita for context",
            "_loaded_at": "Timestamp when record was loaded",
            "_dbt_invocation_id": "dbt invocation ID for lineage tracking",
        },
    },
    "rpt_annual_economic_summary": {
        "description": (
            "Pre-aggregated annual summary for executive reporting. "
            "Contains rankings, YoY changes, and comparisons to EU "
            "averages. Denormalized for dashboard performance."
        ),
        "meta": {
            "owner": "data-engineering",
            "refresh_frequency": "daily",
            "primary_users": ["executives", "analysts"],
        },
        "columns": {
            "summary_key": "Primary key (hash of country_code + reference_year)",
            "country_code": "ISO 2-letter country code",
            "country_key": "Foreign key to dim_country",
            "reference_year": "Reference year",
            "gdp_million_eur": "GDP in million EUR at current prices",
            "population_count": "Population count on January 1st",
            "gdp_per_capita_eur": "GDP per capita in EUR",
            "avg_unemployment_rate_pct": "Average unemployment rate for the year",
            "annual_inflation_rate_pct": "Sum of monthly inflation rates",
            "gdp_rank": "Country's GDP rank within EU for this year (1 = highest)",
            "gdp_per_capita_rank": "Country's GDP per capita rank within EU (1 = highest)",
            "unemployment_rank": "Country's unemployment rank within EU (1 = lowest/best)",
            "inflation_rank": "Country's inflation rank within EU (1 = lowest)",
            "gdp_yoy_growth_pct": "Year-over-year GDP growth as percentage",
            "unemployment_yoy_change_pp": "Year-over-year unemployment change in percentage points",
            "inflation_yoy_change_pp": "Year-over-year inflation change in percentage points",
            "share_of_eu_gdp_pct": "Country's share of total EU GDP as percentage",
            "share_of_eu_population_pct": "Country's share of EU population as percentage",
            "gdp_per_capita_vs_eu_avg": "Difference from EU average GDP per capita (EUR)",
            "unemployment_vs_eu_avg_pp": "Difference from EU average unemployment (pp)",
            "inflation_vs_eu_avg_pp": "Difference from EU average inflation (pp)",
            "has_complete_unemployment_data": "True if all 12 months of unemployment data are present",
            "has_complete_inflation_data": "True if all 12 months of inflation data are present",
            "country_name": "Full country name (denormalized)",
            "eu_status": "EU membership status (denormalized)",
            "eurozone_member": "Eurozone membership (denormalized)",
            "region": "Geographic region (denormalized)",
            "_loaded_at": "Timestamp when record was loaded",
        },
    },
    # ---- models/marts/_python_models.yml ----------------------------
    "py_anomaly_detection": {
        "description": (
            "Statistical anomaly detection for economic indicators. "
            "Uses z-score, IQR, and rate-of-change methods to identify "
            "outliers that may indicate data quality issues or economic "
            "shocks."
        ),
        "meta": {
            "owner": "data-science",
            "model_type": "python",
            "refresh_frequency": "daily",
        },
        "columns": {
            "indicator_key": "Foreign key to fct_economic_indicators",
            "country_code": "ISO 2-letter country code",
            "reference_date": "Reference date for the indicator",
            "unemployment_z_score": "Z-score for unemployment rate (>3 or <-3 is anomalous)",
            "inflation_z_score": "Z-score for inflation rate",
            "is_unemployment_anomaly": "True if unemployment reading is anomalous",
            "is_inflation_anomaly": "True if inflation reading is anomalous",
            "is_any_anomaly": "True if any indicator is anomalous",
            "anomaly_severity_score": "Composite severity score (0-100)",
        },
    },
    "py_unemployment_forecast": {
        "description": (
            "6-month unemployment rate forecasts using multiple "
            "statistical methods. Provides ensemble forecast with "
            "prediction intervals.\n\nMethods used:\n- Exponential "
            "Smoothing\n- Holt's Linear Trend\n- Linear Regression\n\n"
            "Note: This is a demonstration model. Production forecasting "
            "would use more sophisticated methods (ARIMA, Prophet, ML "
            "models)."
        ),
        "meta": {
            "owner": "data-science",
            "model_type": "python",
            "refresh_frequency": "weekly",
        },
        "columns": {
            "country_code": "ISO 2-letter country code",
            "forecast_date": "Date being forecasted",
            "forecast_horizon_months": "Months ahead from last actual (1-6)",
            "last_actual_date": "Most recent date with actual data",
            "last_actual_value": "Most recent actual unemployment rate",
            "forecast_exp_smoothing": "Forecast from exponential smoothing method",
            "forecast_holt": "Forecast from Holt's linear trend method",
            "forecast_linear_reg": "Forecast from linear regression",
            "forecast_ensemble": "Average of all forecast methods (recommended)",
            "prediction_interval_lower": "Lower bound of 95% prediction interval",
            "prediction_interval_upper": "Upper bound of 95% prediction interval",
            "forecast_confidence": "Confidence level: high, medium, or low",
            "min_training_samples": "Number of historical observations used",
        },
    },
    "py_data_quality_scores": {
        "description": (
            "Comprehensive data quality scoring by country. Evaluates "
            "completeness, timeliness, validity, and consistency. Used "
            "for monitoring and prioritizing data remediation."
        ),
        "meta": {
            "owner": "data-engineering",
            "model_type": "python",
            "refresh_frequency": "daily",
        },
        "columns": {
            "country_code": "ISO 2-letter country code",
            "total_records": "Total number of monthly records for this country",
            "completeness_score": "Completeness score (0-100)",
            "timeliness_score": "Timeliness score (0-100)",
            "validity_score": "Validity score (0-100)",
            "consistency_score": "Consistency score (0-100)",
            "overall_quality_score": "Weighted average of all quality dimensions",
            "quality_grade": "Letter grade: A (>90), B (>80), C (>70), D (>60), F (<60)",
            "primary_issue": "Main quality dimension needing improvement",
            "requires_attention": "True if quality score is below 70",
            "days_since_latest_data": "Days since most recent data point",
            "scored_at": "Timestamp when scoring was performed",
        },
    },
}

# Reusable dbt doc blocks (reference docs/overview.md `{% docs %}`
# sections) — the column-semantics blocks models reference via
# `{{ doc(...) }}`. The `__overview__` block is intentionally NOT
# transcribed: it documents the reference's own dbt/DuckDB stack and a
# personal contact; this engine's overview is the repo README.
DOC_BLOCKS: dict[str, str] = {
    "country_code": (
        "ISO 3166-1 alpha-2 country code (e.g., 'DE' for Germany, 'FR' "
        "for France).\n\nSpecial codes:\n- `EU27_2020`: European Union "
        "aggregate (27 member states as of 2020)"
    ),
    "gdp_million_eur": (
        "Gross Domestic Product at current market prices, expressed in "
        "million EUR.\n\nSource: Eurostat dataset `nama_10_gdp`"
    ),
    "unemployment_rate_pct": (
        "Unemployment rate as percentage of active population, "
        "seasonally adjusted.\n\n- Age group: Total (all ages)\n- Sex: "
        "Total (all sexes)\n- Seasonal adjustment: Yes (SA)\n\nSource: "
        "Eurostat dataset `une_rt_m`"
    ),
    "inflation_rate_mom_pct": (
        "Harmonised Index of Consumer Prices (HICP), month-over-month "
        "rate of change.\n\n- Coverage: All-items (COICOP: CP00)\n- "
        "Calculation: (Current month index / Previous month index - 1) "
        "* 100\n\nSource: Eurostat dataset `prc_hicp_mmor`"
    ),
}

# source name -> docs (reference models/staging/_sources.yml; the
# source group itself is documented there too)
SOURCE_GROUP_DOC = (
    "Raw data extracted from Eurostat REST API. Contains economic "
    "indicators for EU member states."
)

SOURCE_DOCS: dict[str, dict] = {
    "raw_gdp": {
        "description": (
            "Gross Domestic Product and main components from Eurostat "
            "dataset nama_10_gdp. Values in current prices, million EUR."
        ),
        "columns": {
            "geo_code": "ISO 2-letter country code",
            "time_code": "Reference year (YYYY format)",
            "value": "GDP value in million EUR",
        },
    },
    "raw_unemployment": {
        "description": (
            "Monthly unemployment rate from Eurostat dataset une_rt_m. "
            "Seasonally adjusted, percentage of active population."
        ),
        "columns": {
            "geo_code": "ISO 2-letter country code",
            "time_code": "Reference period (YYYY-MM format)",
            "value": "Unemployment rate as percentage",
        },
    },
    "raw_inflation": {
        "description": (
            "HICP monthly rate of change from Eurostat dataset "
            "prc_hicp_mmor. All-items index, month-over-month "
            "percentage change."
        ),
        "columns": {
            "geo_code": "ISO 2-letter country code",
            "time_code": "Reference period (YYYY-MM format)",
            "value": "Month-over-month inflation rate",
        },
    },
    "raw_population": {
        "description": (
            "Population on 1 January from Eurostat dataset demo_pjan. "
            "Total population count."
        ),
        "columns": {
            "geo_code": "ISO 2-letter country code",
            "time_code": "Reference year (YYYY format)",
            "value": "Population count",
        },
    },
}
