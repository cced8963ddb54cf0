// Calibration driver: build the REFERENCE HNSWIndex_Single<float,float> on
// raw fp32 vectors and report recall/latency per ef — the apples-to-apples
// target for the TPU rebuild's graph quality on identical data.
//
// Bypasses the factories (whose spaces dispatch needs cpu_features) by
// instantiating the index directly with a scalar IP distance; -O3
// -march=native auto-vectorizes the dot product. Data must be
// pre-normalized (metric=IP == cosine on normalized vectors).
//
// Usage: ref_driver data.f32 N dim queries.f32 Q gt.i32 K M efC "ef1,ef2,..."
//        [save_path]
//    or: ref_driver load index.hnsw queries.f32 Q gt.i32 K "ef1,ef2,..."
//
// The load mode mirrors HNSWFactory::NewIndex(location)
// (hnsw_factory.cpp:182-217): read version + algo + param prefix, construct
// HNSWIndex_Single from the stream, restoreGraph — so the REFERENCE search
// runs over a graph built by the TPU engine (exported via
// utils/hnsw_file_format.py), closing the 2x2 graph/search recall matrix.

#include <chrono>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <set>
#include <string>
#include <vector>

#include "VecSim/algorithms/hnsw/hnsw_single.h"
#include "VecSim/spaces/computer/calculator.h"
#include "VecSim/spaces/computer/preprocessor_container.h"

static float ip_dist(const void *a, const void *b, size_t dim) {
    const float *x = (const float *)a, *y = (const float *)b;
    float s = 0.f;
    for (size_t i = 0; i < dim; i++)
        s += x[i] * y[i];
    return 1.0f - s;
}

static void run_sweep(HNSWIndex<float, float> *idx, const std::vector<float> &q,
                      const std::vector<int32_t> &gt, size_t Q, size_t K, size_t dim,
                      const std::string &efs, const char *event) {
    size_t pos = 0;
    while (pos < efs.size()) {
        size_t c = efs.find(',', pos);
        if (c == std::string::npos)
            c = efs.size();
        size_t ef = atoll(efs.substr(pos, c - pos).c_str());
        pos = c + 1;

        VecSimQueryParams qp = {};
        qp.hnswRuntimeParams.efRuntime = ef;
        double hits = 0;
        auto tq = std::chrono::steady_clock::now();
        for (size_t b = 0; b < Q; b++) {
            auto *rep = idx->topKQuery(q.data() + b * dim, K, &qp);
            std::set<int32_t> got;
            for (auto &r : rep->results)
                got.insert((int32_t)r.id);
            for (size_t j = 0; j < K; j++)
                hits += got.count(gt[b * K + j]);
            VecSimQueryReply_Free(rep);
        }
        double qs = std::chrono::duration<double>(std::chrono::steady_clock::now() - tq).count();
        printf("{\"event\": \"%s\", \"ef\": %zu, \"k\": %zu, \"recall\": %.4f, "
               "\"qps\": %.1f}\n",
               event, ef, K, hits / (Q * K), Q / qs);
        fflush(stdout);
    }
}

#ifdef BUILD_TESTS
// Reference search over an externally built graph (ours, exported V3/V4).
static int load_main(int argc, char **argv) {
    if (argc < 8) {
        fprintf(stderr, "args: load index.hnsw q.f32 Q gt.i32 K efs\n");
        return 2;
    }
    const char *path = argv[2], *q_path = argv[3];
    size_t Q = atoll(argv[4]);
    const char *gt_path = argv[5];
    size_t K = atoll(argv[6]);
    std::string efs = argv[7];

    std::ifstream input(path, std::ios::binary);
    if (!input.is_open()) {
        fprintf(stderr, "cannot open %s\n", path);
        return 1;
    }
    auto version = HNSWSerializer::ReadVersion(input);
    VecSimAlgo algo = VecSimAlgo_BF;
    Serializer::readBinaryPOD(input, algo);
    if (algo != VecSimAlgo_HNSWLIB) {
        fprintf(stderr, "not an HNSW file\n");
        return 1;
    }
    HNSWParams hp = {};
    Serializer::readBinaryPOD(input, hp.dim);
    Serializer::readBinaryPOD(input, hp.type);
    Serializer::readBinaryPOD(input, hp.metric);
    Serializer::readBinaryPOD(input, hp.blockSize);
    Serializer::readBinaryPOD(input, hp.multi);
    Serializer::readBinaryPOD(input, hp.initialCapacity);
    hp.epsilon = 0.01;
    size_t dim = hp.dim;

    std::vector<float> q(Q * dim);
    std::vector<int32_t> gt(Q * K);
    {
        std::ifstream fq(q_path, std::ios::binary);
        fq.read((char *)q.data(), q.size() * 4);
        std::ifstream fg(gt_path, std::ios::binary);
        fg.read((char *)gt.data(), gt.size() * 4);
        if (!fq || !fg) {
            fprintf(stderr, "read failed\n");
            return 1;
        }
    }

    auto allocator = VecSimAllocator::newVecsimAllocator();
    AbstractIndexInitParams ap = {};
    ap.allocator = allocator;
    ap.dim = dim;
    ap.vecType = VecSimType_FLOAT32;
    ap.storedDataSize = dim * sizeof(float);
    ap.metric = VecSimMetric_IP;
    ap.blockSize = hp.blockSize ? hp.blockSize : 1024;
    ap.multi = false;
    ap.isDisk = false;
    ap.logCtx = nullptr;
    ap.inputBlobSize = dim * sizeof(float);

    IndexComponents<float, float> comps = {
        new (allocator) DistanceCalculatorCommon<float>(allocator, ip_dist),
        new (allocator) PreprocessorsContainerAbstract(allocator, 0),
    };

    auto *idx =
        new (allocator) HNSWIndex_Single<float, float>(input, &hp, ap, comps, version);
    idx->restoreGraph(input, version);
    fprintf(stderr, "# loaded n=%zu\n", idx->indexSize());

    run_sweep(idx, q, gt, Q, K, dim, efs, "ref_topk_on_loaded_graph");
    VecSimIndexAbstract<float, float> *base = idx;
    delete base;
    return 0;
}
#endif

int main(int argc, char **argv) {
#ifdef BUILD_TESTS
    if (argc > 1 && strcmp(argv[1], "load") == 0)
        return load_main(argc, argv);
#endif
    if (argc < 10) {
        fprintf(stderr, "args: data.f32 N dim q.f32 Q gt.i32 K M efC efs [save]\n");
        return 2;
    }
    const char *data_path = argv[1];
    size_t N = atoll(argv[2]), dim = atoll(argv[3]);
    const char *q_path = argv[4];
    size_t Q = atoll(argv[5]);
    const char *gt_path = argv[6];
    size_t K = atoll(argv[7]), M = atoll(argv[8]), efC = atoll(argv[9]);
    std::string efs = argv[10];
    const char *save = argc > 11 ? argv[11] : nullptr;

    std::vector<float> data(N * dim), q(Q * dim);
    std::vector<int32_t> gt(Q * K);
    {
        std::ifstream f(data_path, std::ios::binary);
        f.read((char *)data.data(), data.size() * 4);
        std::ifstream fq(q_path, std::ios::binary);
        fq.read((char *)q.data(), q.size() * 4);
        std::ifstream fg(gt_path, std::ios::binary);
        fg.read((char *)gt.data(), gt.size() * 4);
        if (!f || !fq || !fg) {
            fprintf(stderr, "read failed\n");
            return 1;
        }
    }

    auto allocator = VecSimAllocator::newVecsimAllocator();
    AbstractIndexInitParams ap = {};
    ap.allocator = allocator;
    ap.dim = dim;
    ap.vecType = VecSimType_FLOAT32;
    ap.storedDataSize = dim * sizeof(float);
    ap.metric = VecSimMetric_IP;
    ap.blockSize = 1024;
    ap.multi = false;
    ap.isDisk = false;
    ap.logCtx = nullptr;
    ap.inputBlobSize = dim * sizeof(float);

    IndexComponents<float, float> comps = {
        new (allocator) DistanceCalculatorCommon<float>(allocator, ip_dist),
        new (allocator) PreprocessorsContainerAbstract(allocator, 0),
    };

    HNSWParams hp = {};
    hp.type = VecSimType_FLOAT32;
    hp.dim = dim;
    hp.metric = VecSimMetric_IP;
    hp.multi = false;
    hp.blockSize = 1024;
    hp.M = M;
    hp.efConstruction = efC;
    hp.efRuntime = 10;
    hp.epsilon = 0.01;

    auto *idx = new (allocator) HNSWIndex_Single<float, float>(&hp, ap, comps, /*seed=*/100);

    auto t0 = std::chrono::steady_clock::now();
    for (size_t i = 0; i < N; i++) {
        idx->addVector(data.data() + i * dim, (labelType)i);
        if (i % 100000 == 99999) {
            double s = std::chrono::duration<double>(std::chrono::steady_clock::now() - t0).count();
            fprintf(stderr, "# inserted %zu (%.0f v/s)\n", i + 1, (i + 1) / s);
        }
    }
    double build_s =
        std::chrono::duration<double>(std::chrono::steady_clock::now() - t0).count();
    printf("{\"event\": \"ref_build\", \"n\": %zu, \"M\": %zu, \"efC\": %zu, "
           "\"seconds\": %.1f, \"vectors_per_sec\": %.1f}\n",
           N, M, efC, build_s, N / build_s);
    fflush(stdout);

#ifdef BUILD_TESTS
    if (save) {
        idx->saveIndex(save);
        fprintf(stderr, "# saved %s\n", save);
    }
#endif

    run_sweep(idx, q, gt, Q, K, dim, efs, "ref_topk");
    VecSimIndexAbstract<float, float> *base = idx;
    delete base;
    return 0;
}
