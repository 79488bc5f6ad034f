"""Package logger (counterpart of mani_skill/utils/logging_utils.py)."""
import logging

logger = logging.getLogger("maniskill_tpu")
if not logger.handlers:
    _h = logging.StreamHandler()
    _h.setFormatter(logging.Formatter("[%(name)s] %(levelname)s: %(message)s"))
    logger.addHandler(_h)
logger.setLevel(logging.INFO)
