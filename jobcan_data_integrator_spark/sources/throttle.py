"""Request throttling (reference S1, ``gateway/throttled_request.py:22-72``).

The reference enforces a minimum interval between HTTP requests
(default 0.72 s = 5000 req/h, ``config/config.ini:46-54``) by sleeping
to the interval before each call.  Same semantics here, with an
injectable clock so tests assert timing without wall-clock sleeps.
"""

from __future__ import annotations

import time
from collections.abc import Callable


class TokenBucket:
    """Sleep-to-interval throttle shared by every request of one client.

    One bucket per pipeline run — the 5000 req/h budget is an account-wide
    API contract, so a distributed deployment must still funnel fetches
    through a single bucket (single fetch task), per SURVEY.md §7.2.
    """

    def __init__(
        self,
        min_interval: float = 0.72,
        *,
        clock: Callable[[], float] = time.monotonic,
        sleep: Callable[[float], None] = time.sleep,
    ) -> None:
        self.min_interval = max(0.0, min_interval)
        self._clock = clock
        self._sleep = sleep
        self._last: float | None = None

    def acquire(self) -> None:
        """Block until the minimum interval since the last call has passed."""
        now = self._clock()
        if self._last is not None:
            wait = self._last + self.min_interval - now
            if wait > 0:
                self._sleep(wait)
                now = self._clock()
        self._last = now

    @classmethod
    def from_requests_per_hour(cls, requests_per_hour: int, **kw) -> "TokenBucket":
        """Derive the interval from an hourly budget
        (reference ``integrator_config.py:94-97``)."""
        return cls(3600.0 / requests_per_hour if requests_per_hour > 0 else 0.0, **kw)
