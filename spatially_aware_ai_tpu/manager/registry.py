"""Multi-scene serving: one process, many scenes, shared model engines.

The reference binds its whole server to a single scan_name chosen at boot
(app_unity.py:15-24 builds one InSituManager at import). A real deployment
(a home with several rooms, a site with several floors) wants one endpoint
for all of them — and on an accelerator the expensive part of a manager is
its model towers, not its scene state. SceneRegistry therefore:

- discovers scenes as the subdirectories of `scan_dir` that contain vNN
  version directories (the reference's scan layout),
- builds one InSituManager per scene LAZILY on first use (first touch pays
  that scene's reconstruction-or-reload, exactly like a single-scene boot),
- shares the CLIP engine and the kMaX segmenter across all managers: both
  are stateless at inference time (weights + jitted programs; jax jit
  dispatch is thread-safe), so N scenes cost one set of tower weights and
  one set of compiled programs instead of N. Per-scene state — grids,
  scene knowledge, the in-situ DGCNN (stateful weights + label list) —
  stays per manager.

The HTTP layer routes on an optional `scene` form/query field
(server/app.py); requests without it hit `default_scene`, so single-scene
clients (the reference's Unity contract) work unchanged.
"""
from __future__ import annotations

import os
import threading
import time
from typing import Dict, Optional

from .manager import InSituManager


class SceneRegistry:
    def __init__(
        self,
        scan_dir: str,
        output_dir: str,
        default_scene: str,
        manager_kwargs: Optional[dict] = None,
        max_loaded: int = 0,
    ):
        self.scan_dir = scan_dir
        self.output_dir = output_dir
        self.default_scene = default_scene
        # 0 = unlimited. Each LOADED scene pins its voxel feature grid on
        # device (~1 GB at the default operating point); max_loaded bounds
        # that by evicting the least-recently-used idle scene before a new
        # build. Evicted scenes reload from their artifacts on next touch.
        self.max_loaded = max_loaded
        self._kwargs = dict(manager_kwargs or {})
        if "insitu_model" in self._kwargs:
            # the in-situ DGCNN is stateful per scene (weights + label
            # list + artifact paths); sharing one instance would leak one
            # scene's labels into another. Pass insitu_factory (called
            # with the scene name per built manager) to customize it.
            raise ValueError(
                "insitu_model cannot be shared across scenes; pass "
                "insitu_factory=lambda scene_name: InSituLearning(...) "
                "for a per-scene custom model"
            )
        self._insitu_factory = self._kwargs.pop("insitu_factory", None)
        self._managers: Dict[str, InSituManager] = {}
        self._last_used: Dict[str, float] = {}
        # one build at a time: concurrent first-touches of two scenes would
        # otherwise interleave reconstructions on the same chip
        self._build_lock = threading.Lock()
        self._engines = None

    # -- discovery -----------------------------------------------------------

    def scene_names(self):
        """Scenes = scan_dir subdirectories holding vNN version dirs."""
        try:
            candidates = sorted(os.listdir(self.scan_dir))
        except OSError:
            return []
        out = []
        for name in candidates:
            d = os.path.join(self.scan_dir, name)
            if not os.path.isdir(d):
                continue
            if any(
                v.startswith("v") and v[1:].isdigit()
                for v in os.listdir(d)
            ):
                out.append(name)
        return out

    # -- engines -------------------------------------------------------------

    def _shared_engines(self):
        """CLIP + kMaX built once for every scene (same construction rules
        as a bare InSituManager: SAI_*_CHECKPOINT env or random weights,
        manager.py InSituManager.__init__). Explicitly injected engines in
        manager_kwargs win (tests use tiny towers)."""
        if self._engines is None:
            clip = self._kwargs.pop("clip_engine", None)
            seg = self._kwargs.pop("seg_model", None)
            if clip is None:
                from ..models.clip.engine import ClipEngine

                ckpt = os.environ.get("SAI_CLIP_CHECKPOINT")
                clip = (
                    ClipEngine.from_checkpoint(ckpt)
                    if ckpt else ClipEngine.random()
                )
            if seg is None:
                from ..models.kmax import KmaxSegmenter

                kmax_ckpt = os.environ.get("SAI_KMAX_CHECKPOINT")
                seg = (
                    KmaxSegmenter.from_checkpoint(kmax_ckpt)
                    if kmax_ckpt else KmaxSegmenter()
                )
            self._engines = (clip, seg)
        return self._engines

    # -- resolution ----------------------------------------------------------

    def get(self, name: Optional[str] = None) -> InSituManager:
        """The manager for `name` (default_scene when None/empty), built on
        first use. Raises ValueError for a scene that does not exist on
        disk (the HTTP layer maps that to a 400 with the scene list)."""
        name = name or self.default_scene
        mgr = self._managers.get(name)
        if mgr is not None:
            self._last_used[name] = time.monotonic()
            return mgr
        with self._build_lock:
            mgr = self._managers.get(name)  # lost the race -> reuse
            if mgr is not None:
                self._last_used[name] = time.monotonic()
                return mgr
            if name not in self.scene_names():
                raise ValueError(
                    f"unknown scene {name!r}; available: "
                    f"{self.scene_names()}"
                )
            if self.max_loaded:
                self._evict_locked(self.max_loaded - 1)
            clip, seg = self._shared_engines()
            kwargs = dict(self._kwargs)
            if clip is not None:
                kwargs["clip_engine"] = clip
            if seg is not None:
                kwargs["seg_model"] = seg
            if self._insitu_factory is not None:
                kwargs["insitu_model"] = self._insitu_factory(name)
            mgr = InSituManager(
                scan_dir=self.scan_dir,
                scan_name=name,
                output_dir=self.output_dir,
                **kwargs,
            )
            self._managers[name] = mgr
            self._last_used[name] = time.monotonic()
            return mgr

    def _evictable(self, mgr: InSituManager) -> bool:
        """A scene may be dropped only when nothing transient would be
        lost: no live streaming session and no background rebuild. All
        durable state (artifacts, in-situ weights) is already on disk —
        the manager flushes pending saves before release."""
        live = getattr(mgr, "_live", None)
        if live is not None and not live.ended:
            return False
        if getattr(mgr, "_sync_rebuild", False):
            # a blocking run_clipfusion holds mgr.lock for its whole
            # rebuild but sets no _fusion_job — without this check the
            # LRU could drop the scene mid-rebuild and a re-touch would
            # start a SECOND concurrent reconstruction of it
            return False
        if getattr(mgr, "_live_finalizing", False):
            return False
        job = mgr.scan_status()
        if job.get("state") == "running":
            return False
        return True

    def _evict_locked(self, keep: int):
        """Drop least-recently-used idle scenes until at most `keep`
        remain loaded. Called under _build_lock. In-flight requests that
        already hold the evicted manager finish safely on it (the object
        stays valid; only the registry reference is dropped, and the
        next touch reloads the scene from its artifacts)."""
        by_age = sorted(self._managers, key=lambda n: self._last_used[n])
        for victim in by_age:
            if len(self._managers) <= keep:
                return
            mgr = self._managers[victim]
            if not self._evictable(mgr):
                continue
            # under mgr.lock: an unlocked wait races a save submitted by
            # a concurrent locked operation (clearing _save_future over a
            # fresh future would let later readers skip waiting)
            with mgr.lock:
                mgr._wait_for_save()  # durable artifacts before release
            del self._managers[victim]
            del self._last_used[victim]

    def status(self) -> dict:
        """The /scenes payload: every scene on disk + per-loaded-scene
        serving state."""
        loaded = {}
        # snapshot: get() inserts under _build_lock while this may run on
        # another request thread — iterating the live dict would race
        for name, mgr in list(self._managers.items()):
            loaded[name] = {
                "version": mgr.curr_ver,
                "reconstructed": bool(mgr.scene_reconstructed),
                "objects": len(
                    (mgr.scene_knowledge or {}).get("unique_objects", {})
                ),
            }
        return {
            "scenes": self.scene_names(),
            "default": self.default_scene,
            "loaded": loaded,
        }
