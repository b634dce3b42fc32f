from .parsers import CommonArgParser, TrainArgParser, EvalArgParser, parse_cli

__all__ = ["CommonArgParser", "TrainArgParser", "EvalArgParser", "parse_cli"]
