from .misc import (update_logs, show_logs, save_logs, set_seed, cpu_stats,
                   ramp_scheduling_function, SchedulerCombiner, untensor)

__all__ = ["update_logs", "show_logs", "save_logs", "set_seed", "cpu_stats",
           "ramp_scheduling_function", "SchedulerCombiner", "untensor"]
