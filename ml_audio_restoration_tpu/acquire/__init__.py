"""Training-data acquisition (parity with the reference's data-scraper sidecar)."""

from .scrapers import (
    AudioFile,
    ScraperConfig,
    ScraperStats,
    BaseScraper,
    InternetArchiveScraper,
    FreesoundScraper,
    MusopenScraper,
    SCRAPERS,
)
from .oauth import FreesoundOAuth

__all__ = [
    "AudioFile",
    "ScraperConfig",
    "ScraperStats",
    "BaseScraper",
    "InternetArchiveScraper",
    "FreesoundScraper",
    "MusopenScraper",
    "SCRAPERS",
    "FreesoundOAuth",
]
