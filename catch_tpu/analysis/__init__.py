"""Probe-set quality-control analysis."""

from catch_tpu.analysis.coverage import Analyzer
