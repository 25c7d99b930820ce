"""Pipeline configuration — mirrors the reference's config.ini surface.

Reference: config.ini:1-20 (folders, monitor interval, validation ranges)
with code fallbacks at pipeline.py:31-37. Bounds are injected, never
hard-coded in operators, because the reference demonstrably ran with
both the config bounds and the fallbacks (quarantine_log.txt:2 used the
humidity fallback [0.0, 1.0]).
"""

from __future__ import annotations

import configparser
from dataclasses import dataclass, field

# NA tokens honored at CSV read time (reference: pipeline.py:286).
NA_TOKENS: tuple[str, ...] = (
    "",
    "#N/A",
    "#N/A N/A",
    "#NA",
    "-1.#IND",
    "-1.#QNAN",
    "-NaN",
    "-nan",
    "1.#IND",
    "1.#QNAN",
    "<NA>",
    "N/A",
    "NULL",
    "NaN",
    "n/a",
    "nan",
    "null",
)

# Expected CSV schema (reference: pipeline.py:97).
EXPECTED_COLUMNS: tuple[str, ...] = (
    "timestamp",
    "sensor_id",
    "temperature",
    "humidity",
    "pressure",
)

METRIC_COLUMNS: tuple[str, ...] = ("temperature", "humidity", "pressure")

# Timestamp formats accepted, in probe order (pandas `pd.to_datetime`
# sniffing parity, reference pipeline.py:124; formats observed in the
# reference's data: test_csv_files_generator.py:90 and the Kaggle raw
# form preprocessing_kaggle_dataset.py:40).
TIMESTAMP_FORMATS: tuple[str, ...] = (
    "yyyy-MM-dd HH:mm:ss",
    "yyyy-MM-dd HH:mm:ss.SSS",
    "yyyy-MM-dd'T'HH:mm:ss",
    "yyyy-MM-dd HH:mm:ss.SSS XXX",
    "yyyy-MM-dd",
    "MM/dd/yyyy HH:mm:ss",
    "MM/dd/yyyy",
)


@dataclass(frozen=True)
class ValidationBounds:
    """Numeric range contract per metric (reference: config.ini:13-20)."""

    temp_min: float = -50.0
    temp_max: float = 50.0
    # Code fallbacks (pipeline.py:34-37); config.ini ships [0.20,0.99]
    # and [980,1050] — callers pick which contract to enforce.
    humidity_min: float = 0.0
    humidity_max: float = 1.0
    pressure_min: float = 900.0
    pressure_max: float = 1100.0

    def range_for(self, metric: str) -> tuple[float, float]:
        return {
            "temperature": (self.temp_min, self.temp_max),
            "humidity": (self.humidity_min, self.humidity_max),
            "pressure": (self.pressure_min, self.pressure_max),
        }[metric]


CONFIG_INI_BOUNDS = ValidationBounds(
    temp_min=-50.0,
    temp_max=50.0,
    humidity_min=0.20,
    humidity_max=0.99,
    pressure_min=980.0,
    pressure_max=1050.0,
)


@dataclass(frozen=True)
class PipelineConfig:
    """Full pipeline config (reference: config.ini + pipeline.py:13-41)."""

    data_folder: str = "data"
    processed_folder: str = "processed"
    quarantine_folder: str = "quarantine"
    monitor_interval_seconds: int = 5
    bounds: ValidationBounds = field(default_factory=ValidationBounds)
    # strict: one bad row quarantines the whole file (pipeline.py:161-165).
    # lenient: bad rows are dropped/quarantined row-wise (the log's
    # historical `MainPipeline` variant, logs/pipeline.log:273).
    strict: bool = True

    @classmethod
    def from_ini(cls, path: str, strict: bool = True) -> PipelineConfig:
        """Load the reference's config.ini key names (config.ini:1-20)
        with the reference's code fallbacks (pipeline.py:30-37): every
        VALIDATION key falls back per-key via ``getfloat(...,
        fallback=...)``, folders/interval live in [DEFAULT]. Values are
        ``strip()``-ed — the shipped ini carries trailing spaces that
        configparser preserves."""
        parser = configparser.ConfigParser()
        with open(path) as fh:  # surface a missing file, unlike parser.read
            parser.read_file(fh)

        def getfloat(key: str, fallback: float) -> float:
            raw = parser.get("VALIDATION", key, fallback=None)
            if raw is None or not raw.strip():
                return fallback
            return float(raw.strip())

        bounds = ValidationBounds(
            temp_min=getfloat("TEMP_MIN", -50.0),
            temp_max=getfloat("TEMP_MAX", 50.0),
            humidity_min=getfloat("HUMIDITY_MIN", 0.0),
            humidity_max=getfloat("HUMIDITY_MAX", 1.0),
            pressure_min=getfloat("PRESSURE_MIN", 900.0),
            pressure_max=getfloat("PRESSURE_MAX", 1100.0),
        )
        default = parser["DEFAULT"]
        return cls(
            data_folder=default.get("DATA_FOLDER", "data").strip(),
            processed_folder=default.get("PROCESSED_FOLDER", "processed").strip(),
            quarantine_folder=default.get("QUARANTINE_FOLDER", "quarantine").strip(),
            monitor_interval_seconds=int(
                default.get("MONITOR_INTERVAL_SECONDS", "5").strip()
            ),
            bounds=bounds,
            strict=strict,
        )
