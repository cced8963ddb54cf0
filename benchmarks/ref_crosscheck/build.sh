#!/bin/sh
# Compile the reference-calibration driver against the read-only reference
# tree. The cpu_features stub replaces the vendored google/cpu_features
# (FetchContent needs network); the driver injects its own scalar distance
# so the per-ISA dispatch is never consulted.
set -e
REF=${REF:-/root/reference}
HERE=$(dirname "$0")
g++ -O3 -march=native -std=c++20 \
    -I"$REF/src" -I"$HERE" -DBUILD_TESTS \
    "$HERE/ref_driver.cpp" \
    "$REF/src/VecSim/memory/vecsim_malloc.cpp" \
    "$REF/src/VecSim/memory/vecsim_base.cpp" \
    "$REF/src/VecSim/algorithms/hnsw/visited_nodes_handler.cpp" \
    "$REF/src/VecSim/containers/data_block.cpp" \
    "$REF/src/VecSim/containers/data_blocks_container.cpp" \
    "$REF/src/VecSim/vec_sim_interface.cpp" \
    "$REF/src/VecSim/query_results.cpp" \
    "$REF/src/VecSim/utils/vec_utils.cpp" \
    "$REF/src/VecSim/algorithms/hnsw/hnsw_serializer.cpp" \
    "$REF/src/VecSim/spaces/computer/preprocessor_container.cpp" \
    -o "$HERE/ref_driver"
echo "built $HERE/ref_driver"
