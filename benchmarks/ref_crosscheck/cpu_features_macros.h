/* Stub for the vendored google/cpu_features dependency (FetchContent is
 * unavailable offline). The driver supplies its own scalar distance
 * function, so the per-ISA dispatch never consults real CPU features —
 * spaces.h only needs the types to exist. Neither arch macro is defined,
 * so spaces.h takes its generic fallback branch. */
#pragma once

namespace cpu_features {
struct X86Features {};
struct X86Info {
    X86Features features;
};
inline X86Info GetX86Info() { return {}; }
} // namespace cpu_features
