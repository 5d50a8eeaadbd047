from cvsd_tpu.serve.export import (export_detector, export_scorer,
                                   load_exported, save_exported)

__all__ = ["export_detector", "export_scorer", "save_exported", "load_exported"]
