"""VO runtimes.

Two implementations behind one constructor:

  * DeviceVO (runtime/device_vo.py) — the whole SLAM state machine runs on
    device; zero per-frame readback. Used for pure-VO configs (the common
    case and the benchmark path).
  * HybridVO (runtime/dpvo.py) — host-orchestrated variant that supports the
    loop-closure backends (global BA, retrieval, Sim3 PGO) and visualization
    hooks; fetches small mirrors per frame.
"""
from .dpvo import DPVO as HybridVO


def DPVO(cfg, network, ht=480, wd=640, viz=False, seed=1234):
    """Constructor with the reference's signature (dpvo/dpvo.py:22)."""
    pure_vo = (not cfg.LOOP_CLOSURE and not cfg.CLASSIC_LOOP_CLOSURE
               and cfg.CENTROID_SEL_STRAT == 'RANDOM' and not viz)
    if pure_vo:
        from .device_driver import DeviceVO
        return DeviceVO(cfg, network, ht, wd, viz, seed)
    return HybridVO(cfg, network, ht, wd, viz, seed)


__all__ = ['DPVO', 'HybridVO']
