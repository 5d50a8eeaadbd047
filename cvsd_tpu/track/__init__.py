from cvsd_tpu.track.tracker import IoUTracker, Track  # noqa: F401
