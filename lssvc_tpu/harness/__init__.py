from .runner import run_test, encode_one
from .results import filter_dict, aggregate_layer_log
