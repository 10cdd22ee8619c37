// rdtsc-based scoped profiler for IAMF_PROF builds: ~20-cycle overhead,
// accumulates raw TSC ticks into prof_ns slots (read as tick SHARES, not
// nanoseconds — the reader normalizes by the slot sum).
#pragma once

#include <x86intrin.h>

#include "celt.h"

namespace iamf_opus {

struct ProfTsc {
  int slot;
  unsigned long long t0;
  explicit ProfTsc(int s) : slot(prof_enabled() ? s : -1) {
    if (slot >= 0) t0 = __rdtsc();
  }
  ~ProfTsc() {
    if (slot >= 0)
      prof_ns[slot].fetch_add((long long)(__rdtsc() - t0),
                              std::memory_order_relaxed);
  }
};

}  // namespace iamf_opus
