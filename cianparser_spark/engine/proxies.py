"""Proxy pool (S4): health-probed rotation, executor-local.

Mirrors the reference's ProxyPool (cianparser/proxy_pool.py:9-61):
probe candidates against a URL, permanently drop the unavailable and
the captcha-walled, keep the first working one; an exhausted pool
means direct fetching (the reference leaves the session's previous
proxy config in place — initially none, i.e. direct).

Deviations (documented):
* the reference probes via ``random.choice`` (proxy_pool.py:41) and
  sleeps 4 s between failed probes; this pool scans in CONFIGURED
  ORDER with no sleep, so behavior is deterministic and identical on
  the sequential simulator and on every executor partition.
* the reference re-runs the probe loop before EVERY list-page fetch
  (cianparser.py:39-48); proxy health in the synthetic web is a pure
  function of the config, so probing once per executor partition is
  observationally identical — the kernel therefore resolves its proxy
  in the per-partition session prologue (engine/stage.py), the Spark
  mapping of one-pool-per-run.

Spark placement: the pool is per PARTITION (executor-local), exactly
like the HTTP session — pool state never crosses the driver, and a
10^3-executor cluster runs 10^3 independent pools, which is how real
crawl fleets shard egress IPs.
"""

from __future__ import annotations

from typing import Callable


class ProxyPool:
    def __init__(self, proxies: tuple | list | None,
                 probe: Callable[[str, str], tuple[bool, bool]]):
        """``probe(url, proxy) -> (available, is_captcha)``."""
        self._pool: list[str] = list(proxies or ())
        self._probe = probe
        self.current: str | None = None
        self.n_probes = 0
        self.dropped: list[str] = []

    def is_empty(self) -> bool:
        return not self._pool

    def get_available_proxy(self, url: str) -> str | None:
        """First healthy proxy in configured order; failing candidates
        are removed permanently (reference: proxy_pool.py:35-61)."""
        while self._pool:
            proxy = self._pool[0]
            self.n_probes += 1
            available, is_captcha = self._probe(url, proxy)
            if available and not is_captcha:
                self.current = proxy
                return proxy
            self._pool.pop(0)
            self.dropped.append(proxy)
        self.current = None
        return None
