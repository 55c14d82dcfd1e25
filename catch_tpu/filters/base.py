"""Abstract filter base class.

API parity with the reference BaseFilter
(/root/reference/catch/filter/base_filter.py:37-180): ``filter(input,
target_genomes, input_is_grouped, num_processes)`` with the
``requires_probe_groupings`` escape hatch and ``_filter`` arity
introspection.

Design difference: the reference parallelizes per-group ``_filter``
calls across a fork-based process pool; here groups run sequentially on
the host while the device executes the heavy per-group compute (the
device is the parallel resource, and its queue is naturally serialized).
``num_processes`` is accepted for API compatibility and ignored.
"""

import inspect

__all__ = ["BaseFilter"]


class BaseFilter:
    """Abstract filter for processing candidate probes.

    Subclasses implement ``_filter(input)`` or
    ``_filter(input, target_genomes)`` returning the processed probes.
    """

    def filter(self, input, target_genomes=None, input_is_grouped=False,
               num_processes=None):
        """Perform the filtering.

        Args:
            input: probes, or a list of per-group probe lists when
                input_is_grouped is True
            target_genomes: list of groupings of Genomes
            input_is_grouped: whether input is grouped
            num_processes: accepted for reference API compatibility;
                unused (device-side parallelism replaces process pools)

        Returns:
            probes (or per-group probe lists) after the filter
        """
        _filter_params = inspect.signature(self._filter).parameters
        wants_genomes = len(_filter_params) == 2

        pass_groupings = getattr(self, "requires_probe_groupings", False)

        if pass_groupings:
            assert input_is_grouped is True
            if wants_genomes:
                return self._filter(input, target_genomes)
            return self._filter(input)

        if input_is_grouped:
            out = []
            for probes in input:
                if wants_genomes:
                    out.append(self._filter(probes, target_genomes))
                else:
                    out.append(self._filter(probes))
            return out
        if wants_genomes:
            return self._filter(input, target_genomes)
        return self._filter(input)

    def _filter(self, input):
        raise NotImplementedError("subclasses must implement _filter")
