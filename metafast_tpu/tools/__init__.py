"""Tool registry: importing this package registers all tools."""

from . import pipeline1, composite, convert, stats_tools, filter_tools, extract_tools, colored_tools, counter_tools, composite2, graph_tools, misc_tools  # noqa: F401
from .framework import all_tools, get_tool, Tool, Param, register  # noqa: F401

ALL_TOOL_MODULES = [pipeline1, composite, convert, stats_tools, filter_tools, extract_tools, colored_tools, counter_tools, composite2, graph_tools, misc_tools]
