"""Console colorization + logging helpers.

Behavioral counterpart of the reference's `umbrella/utils.py` and
`umbrella/logging_config.py` (ANSI colorizer + stdlib console logger).
"""
import logging

_COLORS = {
    "black": "\033[30m",
    "red": "\033[31m",
    "green": "\033[32m",
    "yellow": "\033[33m",
    "blue": "\033[34m",
    "magenta": "\033[35m",
    "cyan": "\033[36m",
    "white": "\033[37m",
    "reset": "\033[0m",
}


class TextColors:
    COLORS = _COLORS

    @staticmethod
    def colorize(text: str, color: str) -> str:
        code = _COLORS.get(color.lower(), _COLORS["reset"])
        return f"{code}{text}{_COLORS['reset']}"


def setup_logger(name: str = "umbrella_tpu", level: int = logging.INFO) -> logging.Logger:
    logger = logging.getLogger(name)
    logger.setLevel(level)
    if not logger.handlers:
        handler = logging.StreamHandler()
        handler.setLevel(level)
        handler.setFormatter(
            logging.Formatter("%(asctime)s - %(name)s - %(levelname)s - %(message)s")
        )
        logger.addHandler(handler)
    return logger
