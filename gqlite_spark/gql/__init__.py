from .parser import parse, parse_one

__all__ = ["parse", "parse_one"]
