"""Shared weather-reading fixture builders for sink/streaming tests."""

from __future__ import annotations

import json


def make_reading(i: int, *, hour: int = 10, day: int = 15) -> dict:
    """Deterministic reading; i drives values across alert thresholds."""
    return {
        "station_id": f"WS{i:03d}",
        "city": ["Mumbai", "Delhi", "Chennai", "Kolkata", "Bengaluru"][i % 5],
        "country": "India",
        "latitude": 19.0 + (i % 10),
        "longitude": 72.0 + (i % 10),
        "timestamp": f"2024-01-{day:02d}T{hour:02d}:{i % 60:02d}:00.000000",
        "temperature_celsius": 25.0 + (i % 20),
        "humidity_percent": 40.0 + (i % 60),
        "pressure_hpa": 990.0 + (i % 40),
        "wind_speed_kmh": float((i * 7) % 100),
        "wind_direction": "NW",
        "precipitation_mm": float((i * 13) % 60),
        "weather_condition": "Clear",
        "visibility_km": float(i % 12),
        "uv_index": i % 13,
        "heat_index_celsius": 25.0 + (i % 35),
    }


def write_batch_file(path, readings: list[dict]) -> None:
    path.write_text(json.dumps({"readings": readings}, indent=2))
