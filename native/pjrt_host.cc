// Minimal PJRT serving host: the TF-Serving role as one C++ binary.
//
// Loads a PJRT C-API plugin (a TPU plugin such as libtpu.so / the axon
// tunnel plugin, or any CPU plugin), creates a client, compiles a
// StableHLO computation exported by `recommenders_tpu.utils.export`, and
// executes it on typed input buffers read from a simple binary format.
// The reference's counterpart is TF Serving loading a SavedModel
// (tensorflow_recommenders/layers/factorized_top_k.py:623-628; round-trip
// proven in layers/factorized_top_k_test.py:75-83).
//
// Usage:
//   pjrt_host PLUGIN.so [--opt KEY=VALUE]... info
//       -> prints the plugin's PJRT API version and platform, creates a
//          client (passing the KEY=VALUEs as PJRT NamedValue create
//          options) and lists devices.
//   pjrt_host PLUGIN.so [--opt KEY=VALUE]... run MODULE.mlir IN.bin \
//       OUT.bin [--co OPTIONS.pb] [--repeat N] [--rotate R] [--pipeline]
//       -> compiles MODULE.mlir (passing OPTIONS.pb as the serialized
//          xla CompileOptionsProto when given; empty options otherwise),
//          executes it on the tensors in IN.bin, writes outputs to
//          OUT.bin. With --repeat N the execute is timed over N
//          iterations and per-iteration stats print to stdout
//          (`repeat_stats: ...`) — the serving-throughput mode.
//          With --rotate R, IN.bin's FIRST R tensors are alternative
//          values for argument 0 (e.g. distinct query batches) and
//          iteration i uses variant i % R — remote-attached runtimes
//          memoize repeated (program, input) executions, so same-input
//          repeats time the cache, not the chip. With --pipeline, all
//          iterations dispatch back-to-back and only the LAST output is
//          awaited (execution is FIFO, so it bounds them all): the
//          throughput-honest mode on links whose per-dispatch ack costs
//          milliseconds; `pipeline_stats: ...` prints per-iteration
//          time. OUT.bin always holds the final iteration's outputs.
//
// Tensor container format (shared with utils/native_serving.py), little
// endian, tensors concatenated:
//   int32 dtype  (0=f32, 1=i32, 2=i64, 3=bf16, 4=f16, 5=u32,
//                 6=bool, 7=i8)
//   int32 rank
//   int64 dims[rank]
//   raw data (product(dims) * element_size bytes)
//
// Integer `--opt` values are passed as kInt64 NamedValues, anything else
// as kString (matches how jax's plugin registration forwards options).
//
// Build: tools/build_native.sh (g++ against tensorflow's bundled
// pjrt_c_api.h; no other dependencies).

#include <dlfcn.h>

#include <algorithm>
#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <string>
#include <vector>

#include "xla/pjrt/c/pjrt_c_api.h"

namespace {

#define CHECK_NULL(err, api, what)                                    \
  do {                                                                \
    if ((err) != nullptr) {                                           \
      PJRT_Error_Message_Args margs;                                  \
      margs.struct_size = PJRT_Error_Message_Args_STRUCT_SIZE;        \
      margs.extension_start = nullptr;                                \
      margs.error = (err);                                            \
      (api)->PJRT_Error_Message(&margs);                              \
      std::fprintf(stderr, "%s failed: %.*s\n", (what),               \
                   static_cast<int>(margs.message_size),              \
                   margs.message);                                    \
      PJRT_Error_Destroy_Args dargs;                                  \
      dargs.struct_size = PJRT_Error_Destroy_Args_STRUCT_SIZE;        \
      dargs.extension_start = nullptr;                                \
      dargs.error = (err);                                            \
      (api)->PJRT_Error_Destroy(&dargs);                              \
      return 1;                                                       \
    }                                                                 \
  } while (0)

std::string ReadFile(const char* path) {
  std::ifstream f(path, std::ios::binary);
  if (!f) {
    std::fprintf(stderr, "cannot open %s\n", path);
    std::exit(1);
  }
  return std::string(std::istreambuf_iterator<char>(f),
                     std::istreambuf_iterator<char>());
}

const PJRT_Api* LoadPlugin(const char* path) {
  void* handle = dlopen(path, RTLD_NOW | RTLD_LOCAL);
  if (!handle) {
    std::fprintf(stderr, "dlopen(%s): %s\n", path, dlerror());
    std::exit(1);
  }
  using GetPjrtApiFn = const PJRT_Api* (*)();
  auto get_api =
      reinterpret_cast<GetPjrtApiFn>(dlsym(handle, "GetPjrtApi"));
  if (!get_api) {
    std::fprintf(stderr, "no GetPjrtApi in %s\n", path);
    std::exit(1);
  }
  return get_api();
}

// --- Client create options (--opt KEY=VALUE) ---------------------------

struct Options {
  // Backing storage must outlive the NamedValue views.
  std::vector<std::string> keys;
  std::vector<std::string> str_values;
  std::vector<int64_t> int_values;
  std::vector<int> kinds;  // 0 = string, 1 = int64
};

bool IsInteger(const std::string& s) {
  if (s.empty()) return false;
  size_t i = (s[0] == '-') ? 1 : 0;
  if (i == s.size()) return false;
  for (; i < s.size(); ++i) {
    if (s[i] < '0' || s[i] > '9') return false;
  }
  return true;
}

void ParseOpt(const char* kv, Options* opts) {
  const char* eq = std::strchr(kv, '=');
  if (!eq) {
    std::fprintf(stderr, "--opt expects KEY=VALUE, got %s\n", kv);
    std::exit(2);
  }
  std::string key(kv, eq - kv);
  std::string value(eq + 1);
  opts->keys.push_back(key);
  if (IsInteger(value)) {
    opts->kinds.push_back(1);
    opts->int_values.push_back(std::strtoll(value.c_str(), nullptr, 10));
    opts->str_values.push_back("");
  } else {
    opts->kinds.push_back(0);
    opts->int_values.push_back(0);
    opts->str_values.push_back(value);
  }
}

std::vector<PJRT_NamedValue> ToNamedValues(const Options& opts) {
  std::vector<PJRT_NamedValue> out;
  for (size_t i = 0; i < opts.keys.size(); ++i) {
    PJRT_NamedValue nv;
    std::memset(&nv, 0, sizeof(nv));
    nv.struct_size = PJRT_NamedValue_STRUCT_SIZE;
    nv.name = opts.keys[i].c_str();
    nv.name_size = opts.keys[i].size();
    if (opts.kinds[i] == 1) {
      nv.type = PJRT_NamedValue_kInt64;
      nv.int64_value = opts.int_values[i];
      nv.value_size = 1;
    } else {
      nv.type = PJRT_NamedValue_kString;
      nv.string_value = opts.str_values[i].c_str();
      nv.value_size = opts.str_values[i].size();
    }
    out.push_back(nv);
  }
  return out;
}

int CreateClient(const PJRT_Api* api, const Options& opts,
                 PJRT_Client** client) {
  PJRT_Plugin_Initialize_Args init_args;
  init_args.struct_size = PJRT_Plugin_Initialize_Args_STRUCT_SIZE;
  init_args.extension_start = nullptr;
  CHECK_NULL(api->PJRT_Plugin_Initialize(&init_args), api,
             "PJRT_Plugin_Initialize");

  std::vector<PJRT_NamedValue> nvs = ToNamedValues(opts);
  PJRT_Client_Create_Args create;
  std::memset(&create, 0, sizeof(create));
  create.struct_size = PJRT_Client_Create_Args_STRUCT_SIZE;
  create.create_options = nvs.empty() ? nullptr : nvs.data();
  create.num_options = nvs.size();
  CHECK_NULL(api->PJRT_Client_Create(&create), api, "PJRT_Client_Create");
  *client = create.client;
  return 0;
}

// --- Typed tensor container -------------------------------------------

constexpr int kDtypeF32 = 0;
constexpr int kDtypeI32 = 1;
constexpr int kDtypeI64 = 2;
constexpr int kDtypeBF16 = 3;
constexpr int kDtypeF16 = 4;
constexpr int kDtypeU32 = 5;
constexpr int kDtypeBool = 6;
constexpr int kDtypeI8 = 7;

int64_t ElementSize(int dtype) {
  switch (dtype) {
    case kDtypeF32: case kDtypeI32: case kDtypeU32: return 4;
    case kDtypeI64: return 8;
    case kDtypeBF16: case kDtypeF16: return 2;
    case kDtypeBool: case kDtypeI8: return 1;
    default:
      std::fprintf(stderr, "unknown dtype code %d\n", dtype);
      std::exit(1);
  }
}

PJRT_Buffer_Type ToBufferType(int dtype) {
  switch (dtype) {
    case kDtypeF32: return PJRT_Buffer_Type_F32;
    case kDtypeI32: return PJRT_Buffer_Type_S32;
    case kDtypeI64: return PJRT_Buffer_Type_S64;
    case kDtypeBF16: return PJRT_Buffer_Type_BF16;
    case kDtypeF16: return PJRT_Buffer_Type_F16;
    case kDtypeU32: return PJRT_Buffer_Type_U32;
    case kDtypeBool: return PJRT_Buffer_Type_PRED;
    case kDtypeI8: return PJRT_Buffer_Type_S8;
    default:
      std::fprintf(stderr, "unknown dtype code %d\n", dtype);
      std::exit(1);
  }
}

int FromBufferType(PJRT_Buffer_Type type) {
  switch (type) {
    case PJRT_Buffer_Type_F32: return kDtypeF32;
    case PJRT_Buffer_Type_S32: return kDtypeI32;
    case PJRT_Buffer_Type_S64: return kDtypeI64;
    case PJRT_Buffer_Type_BF16: return kDtypeBF16;
    case PJRT_Buffer_Type_F16: return kDtypeF16;
    case PJRT_Buffer_Type_U32: return kDtypeU32;
    case PJRT_Buffer_Type_PRED: return kDtypeBool;
    case PJRT_Buffer_Type_S8: return kDtypeI8;
    default:
      std::fprintf(stderr, "unsupported output buffer type %d\n",
                   static_cast<int>(type));
      std::exit(1);
  }
}

struct Tensor {
  int dtype = kDtypeF32;
  std::vector<int64_t> dims;
  std::vector<uint8_t> data;
};

std::vector<Tensor> ReadTensors(const char* path) {
  std::ifstream f(path, std::ios::binary);
  if (!f) {
    std::fprintf(stderr, "cannot open %s\n", path);
    std::exit(1);
  }
  std::vector<Tensor> out;
  while (f.peek() != EOF) {
    int32_t dtype, rank;
    if (!f.read(reinterpret_cast<char*>(&dtype), 4)) break;
    f.read(reinterpret_cast<char*>(&rank), 4);
    Tensor t;
    t.dtype = dtype;
    t.dims.resize(rank);
    f.read(reinterpret_cast<char*>(t.dims.data()), 8 * rank);
    int64_t n = 1;
    for (auto d : t.dims) n *= d;
    t.data.resize(n * ElementSize(dtype));
    f.read(reinterpret_cast<char*>(t.data.data()), t.data.size());
    if (!f) {
      std::fprintf(stderr, "truncated tensor in %s\n", path);
      std::exit(1);
    }
    out.push_back(std::move(t));
  }
  return out;
}

void AwaitAndDestroyEvent(const PJRT_Api* api, PJRT_Event* event) {
  if (event == nullptr) return;
  PJRT_Event_Await_Args await;
  std::memset(&await, 0, sizeof(await));
  await.struct_size = PJRT_Event_Await_Args_STRUCT_SIZE;
  await.event = event;
  api->PJRT_Event_Await(&await);
  PJRT_Event_Destroy_Args destroy;
  std::memset(&destroy, 0, sizeof(destroy));
  destroy.struct_size = PJRT_Event_Destroy_Args_STRUCT_SIZE;
  destroy.event = event;
  api->PJRT_Event_Destroy(&destroy);
}

// Blocks until a buffer's definition event completes. Execution through
// a remote/tunneled plugin can report `device_complete_events` as
// immediately ready (the enqueue, not the compute), so timing or
// reading outputs must synchronize on the buffers themselves.
void AwaitBufferReady(const PJRT_Api* api, PJRT_Buffer* buf) {
  if (buf == nullptr) return;
  PJRT_Buffer_ReadyEvent_Args args;
  std::memset(&args, 0, sizeof(args));
  args.struct_size = PJRT_Buffer_ReadyEvent_Args_STRUCT_SIZE;
  args.buffer = buf;
  if (api->PJRT_Buffer_ReadyEvent(&args) != nullptr) return;
  AwaitAndDestroyEvent(api, args.event);
}

void DestroyBuffer(const PJRT_Api* api, PJRT_Buffer* buf) {
  if (buf == nullptr) return;
  PJRT_Buffer_Destroy_Args args;
  std::memset(&args, 0, sizeof(args));
  args.struct_size = PJRT_Buffer_Destroy_Args_STRUCT_SIZE;
  args.buffer = buf;
  api->PJRT_Buffer_Destroy(&args);
}

// --- Commands ----------------------------------------------------------

int Info(const PJRT_Api* api, const Options& opts) {
  std::printf("pjrt_api_version: %d.%d\n",
              api->pjrt_api_version.major_version,
              api->pjrt_api_version.minor_version);

  PJRT_Client* client = nullptr;
  if (CreateClient(api, opts, &client)) return 1;

  PJRT_Client_PlatformName_Args plat;
  std::memset(&plat, 0, sizeof(plat));
  plat.struct_size = PJRT_Client_PlatformName_Args_STRUCT_SIZE;
  plat.client = client;
  CHECK_NULL(api->PJRT_Client_PlatformName(&plat), api,
             "PJRT_Client_PlatformName");
  std::printf("platform: %.*s\n",
              static_cast<int>(plat.platform_name_size),
              plat.platform_name);

  PJRT_Client_Devices_Args devs;
  std::memset(&devs, 0, sizeof(devs));
  devs.struct_size = PJRT_Client_Devices_Args_STRUCT_SIZE;
  devs.client = client;
  CHECK_NULL(api->PJRT_Client_Devices(&devs), api, "PJRT_Client_Devices");
  std::printf("num_devices: %zu\n", devs.num_devices);
  return 0;
}

int Run(const PJRT_Api* api, const Options& opts, const char* module_path,
        const char* input_path, const char* output_path,
        const char* compile_options_path, int repeat, int rotate,
        bool pipeline) {
  PJRT_Client* client = nullptr;
  if (CreateClient(api, opts, &client)) return 1;

  // Compile the (MLIR text or bytecode) module.
  std::string module = ReadFile(module_path);
  const char kFormat[] = "mlir";
  PJRT_Program program;
  std::memset(&program, 0, sizeof(program));
  program.struct_size = PJRT_Program_STRUCT_SIZE;
  program.code = const_cast<char*>(module.data());
  program.code_size = module.size();
  program.format = kFormat;
  program.format_size = sizeof(kFormat) - 1;

  std::string compile_options;
  if (compile_options_path != nullptr) {
    compile_options = ReadFile(compile_options_path);
  }
  PJRT_Client_Compile_Args compile;
  std::memset(&compile, 0, sizeof(compile));
  compile.struct_size = PJRT_Client_Compile_Args_STRUCT_SIZE;
  compile.client = client;
  compile.program = &program;
  compile.compile_options = compile_options.data();
  compile.compile_options_size = compile_options.size();

  auto compile_start = std::chrono::steady_clock::now();
  CHECK_NULL(api->PJRT_Client_Compile(&compile), api,
             "PJRT_Client_Compile");
  PJRT_LoadedExecutable* exe = compile.executable;
  double compile_ms =
      std::chrono::duration<double, std::milli>(
          std::chrono::steady_clock::now() - compile_start)
          .count();
  std::printf("compile_ms: %.1f\n", compile_ms);

  PJRT_Client_Devices_Args devs;
  std::memset(&devs, 0, sizeof(devs));
  devs.struct_size = PJRT_Client_Devices_Args_STRUCT_SIZE;
  devs.client = client;
  CHECK_NULL(api->PJRT_Client_Devices(&devs), api, "PJRT_Client_Devices");
  if (devs.num_devices == 0) {
    std::fprintf(stderr, "no devices\n");
    return 1;
  }
  PJRT_Device* device = devs.devices[0];

  // Host → device buffers. With --rotate R, tensors [0, R) are the
  // variants of argument 0; [R, end) are the remaining arguments.
  std::vector<Tensor> inputs = ReadTensors(input_path);
  if (rotate < 1) rotate = 1;
  if (inputs.size() < static_cast<size_t>(rotate)) {
    std::fprintf(stderr, "--rotate %d needs at least that many tensors\n",
                 rotate);
    return 1;
  }
  std::vector<PJRT_Buffer*> all_buffers;
  for (auto& t : inputs) {
    PJRT_Client_BufferFromHostBuffer_Args h2d;
    std::memset(&h2d, 0, sizeof(h2d));
    h2d.struct_size = PJRT_Client_BufferFromHostBuffer_Args_STRUCT_SIZE;
    h2d.client = client;
    h2d.data = t.data.data();
    h2d.type = ToBufferType(t.dtype);
    h2d.dims = t.dims.data();
    h2d.num_dims = t.dims.size();
    h2d.host_buffer_semantics =
        PJRT_HostBufferSemantics_kImmutableUntilTransferCompletes;
    h2d.device = device;
    CHECK_NULL(api->PJRT_Client_BufferFromHostBuffer(&h2d), api,
               "BufferFromHostBuffer");
    AwaitAndDestroyEvent(api, h2d.done_with_host_buffer);
    all_buffers.push_back(h2d.buffer);
  }
  // Per-variant argument lists: variant r's arg 0, then the shared tail.
  size_t num_args = all_buffers.size() - rotate + 1;
  std::vector<std::vector<PJRT_Buffer*>> variant_args(rotate);
  for (int r = 0; r < rotate; ++r) {
    variant_args[r].push_back(all_buffers[r]);
    for (size_t a = rotate; a < all_buffers.size(); ++a) {
      variant_args[r].push_back(all_buffers[a]);
    }
  }

  PJRT_ExecuteOptions opts_exec;
  std::memset(&opts_exec, 0, sizeof(opts_exec));
  opts_exec.struct_size = PJRT_ExecuteOptions_STRUCT_SIZE;

  int iters = std::max(repeat, 1);
  std::vector<double> iter_ms;
  std::vector<PJRT_Buffer*> out_slots(64, nullptr);
  if (pipeline) {
    // Throughput mode: dispatch every iteration back-to-back and fence
    // with a device→host FETCH of the final output (buffer-ready
    // events and device_complete_events both ack before execution
    // completes on remote-attached plugins — a data read is the only
    // honest fence). The fetch round-trip is a constant; to cancel it
    // the run is timed twice — a short run and the full run — and the
    // difference is the marginal per-iteration cost, the same
    // methodology as bench.py's scan differencing.
    // NOTE: CHECK_NULL expands to `return 1`, so these lambdas must be
    // explicitly int-returning (falling off the end of a deduced-int
    // lambda is UB — it segfaulted in practice).
    auto dispatch_n = [&](int count,
                          std::vector<std::vector<PJRT_Buffer*>>& outs)
        -> int {
      outs.assign(count, std::vector<PJRT_Buffer*>(64, nullptr));
      for (int it = 0; it < count; ++it) {
        PJRT_Buffer** arg_list = variant_args[it % rotate].data();
        PJRT_Buffer* const* const* args_per_device =
            reinterpret_cast<PJRT_Buffer* const* const*>(&arg_list);
        PJRT_Buffer** out_list = outs[it].data();
        PJRT_Buffer*** outputs_per_device = &out_list;
        PJRT_LoadedExecutable_Execute_Args exec;
        std::memset(&exec, 0, sizeof(exec));
        exec.struct_size = PJRT_LoadedExecutable_Execute_Args_STRUCT_SIZE;
        exec.executable = exe;
        exec.options = &opts_exec;
        exec.argument_lists = args_per_device;
        exec.num_devices = 1;
        exec.num_args = num_args;
        exec.output_lists = outputs_per_device;
        exec.device_complete_events = nullptr;
        CHECK_NULL(api->PJRT_LoadedExecutable_Execute(&exec), api,
                   "Execute");
      }
      return 0;
    };
    auto fetch_fence =
        [&](std::vector<std::vector<PJRT_Buffer*>>& outs) -> int {
      PJRT_Buffer* buf = outs.back()[0];
      PJRT_Buffer_ElementType_Args type_args;
      std::memset(&type_args, 0, sizeof(type_args));
      type_args.struct_size = PJRT_Buffer_ElementType_Args_STRUCT_SIZE;
      type_args.buffer = buf;
      CHECK_NULL(api->PJRT_Buffer_ElementType(&type_args), api,
                 "ElementType");
      PJRT_Buffer_Dimensions_Args dim_args;
      std::memset(&dim_args, 0, sizeof(dim_args));
      dim_args.struct_size = PJRT_Buffer_Dimensions_Args_STRUCT_SIZE;
      dim_args.buffer = buf;
      CHECK_NULL(api->PJRT_Buffer_Dimensions(&dim_args), api,
                 "Dimensions");
      int64_t n = 1;
      for (size_t i = 0; i < dim_args.num_dims; ++i) n *= dim_args.dims[i];
      std::vector<uint8_t> host(
          n * ElementSize(FromBufferType(type_args.type)));
      PJRT_Buffer_ToHostBuffer_Args d2h;
      std::memset(&d2h, 0, sizeof(d2h));
      d2h.struct_size = PJRT_Buffer_ToHostBuffer_Args_STRUCT_SIZE;
      d2h.src = buf;
      d2h.dst = host.data();
      d2h.dst_size = host.size();
      CHECK_NULL(api->PJRT_Buffer_ToHostBuffer(&d2h), api,
                 "ToHostBuffer");
      AwaitAndDestroyEvent(api, d2h.event);
      return 0;
    };
    auto destroy_all = [&](std::vector<std::vector<PJRT_Buffer*>>& outs) {
      for (auto& slots : outs) {
        for (auto& slot : slots) DestroyBuffer(api, slot);
      }
    };
    auto timed_run = [&](int count,
                         std::vector<std::vector<PJRT_Buffer*>>& outs,
                         double* ms) -> int {
      auto t0 = std::chrono::steady_clock::now();
      if (dispatch_n(count, outs)) return 1;
      if (fetch_fence(outs)) return 1;
      *ms = std::chrono::duration<double, std::milli>(
                std::chrono::steady_clock::now() - t0)
                .count();
      return 0;
    };

    if (iters < 4) iters = 4;  // Differencing needs a short/long gap.
    int shortn = std::max(2, iters / 10);
    std::vector<std::vector<PJRT_Buffer*>> outs;
    if (dispatch_n(2, outs)) return 1;  // Warmup (setup cost).
    if (fetch_fence(outs)) return 1;
    destroy_all(outs);
    double short_ms = 0, long_ms = 0;
    if (timed_run(shortn, outs, &short_ms)) return 1;
    destroy_all(outs);
    if (timed_run(iters, outs, &long_ms)) return 1;
    double per_iter_ms = (long_ms - short_ms) / (iters - shortn);
    std::printf(
        "pipeline_stats: iters=%d short_iters=%d rotate=%d "
        "long_ms=%.3f short_ms=%.3f per_iter_ms=%.4f\n",
        iters, shortn, rotate, long_ms, short_ms, per_iter_ms);
    out_slots = outs[iters - 1];
    for (int it = 0; it + 1 < iters; ++it) {
      for (auto& slot : outs[it]) DestroyBuffer(api, slot);
    }
  } else {
    for (int it = 0; it < iters; ++it) {
      for (auto& slot : out_slots) {
        DestroyBuffer(api, slot);
        slot = nullptr;
      }
      PJRT_Buffer** arg_list = variant_args[it % rotate].data();
      PJRT_Buffer* const* const* args_per_device =
          reinterpret_cast<PJRT_Buffer* const* const*>(&arg_list);
      PJRT_Buffer** out_list = out_slots.data();
      PJRT_Buffer*** outputs_per_device = &out_list;

      PJRT_LoadedExecutable_Execute_Args exec;
      std::memset(&exec, 0, sizeof(exec));
      exec.struct_size = PJRT_LoadedExecutable_Execute_Args_STRUCT_SIZE;
      exec.executable = exe;
      exec.options = &opts_exec;
      exec.argument_lists = args_per_device;
      exec.num_devices = 1;
      exec.num_args = num_args;
      exec.output_lists = outputs_per_device;
      PJRT_Event* done = nullptr;
      exec.device_complete_events = &done;
      auto t0 = std::chrono::steady_clock::now();
      CHECK_NULL(api->PJRT_LoadedExecutable_Execute(&exec), api,
                 "Execute");
      AwaitAndDestroyEvent(api, done);
      // device_complete_events can be trivially ready on remote plugins
      // (it signals the enqueue); block on the output buffers for honest
      // per-iteration timing and safe reuse.
      for (PJRT_Buffer* buf : out_slots) {
        if (buf == nullptr) break;
        AwaitBufferReady(api, buf);
      }
      iter_ms.push_back(std::chrono::duration<double, std::milli>(
                            std::chrono::steady_clock::now() - t0)
                            .count());
    }
  }
  if (repeat > 1 && !pipeline) {
    std::vector<double> sorted = iter_ms;
    std::sort(sorted.begin(), sorted.end());
    double total = 0;
    for (double v : iter_ms) total += v;
    std::printf(
        "repeat_stats: iters=%zu mean_ms=%.3f median_ms=%.3f min_ms=%.3f "
        "max_ms=%.3f\n",
        iter_ms.size(), total / iter_ms.size(),
        sorted[sorted.size() / 2], sorted.front(), sorted.back());
  }

  // Device → host, write OUTPUT.bin in the typed container format.
  std::ofstream out(output_path, std::ios::binary);
  for (PJRT_Buffer* buf : out_slots) {
    if (buf == nullptr) break;
    PJRT_Buffer_ElementType_Args type_args;
    std::memset(&type_args, 0, sizeof(type_args));
    type_args.struct_size = PJRT_Buffer_ElementType_Args_STRUCT_SIZE;
    type_args.buffer = buf;
    CHECK_NULL(api->PJRT_Buffer_ElementType(&type_args), api,
               "ElementType");
    int dtype = FromBufferType(type_args.type);

    PJRT_Buffer_Dimensions_Args dim_args;
    std::memset(&dim_args, 0, sizeof(dim_args));
    dim_args.struct_size = PJRT_Buffer_Dimensions_Args_STRUCT_SIZE;
    dim_args.buffer = buf;
    CHECK_NULL(api->PJRT_Buffer_Dimensions(&dim_args), api, "Dimensions");

    int64_t n = 1;
    for (size_t i = 0; i < dim_args.num_dims; ++i) n *= dim_args.dims[i];
    std::vector<uint8_t> host(n * ElementSize(dtype));

    // Request a dense row-major host layout explicitly: on-device
    // buffers may live in a padded/tiled layout (TPU (8, 128) tiles),
    // and without host_layout some plugins dump the physical layout —
    // correct at small shapes that happen to be dense, silently
    // interleaved at larger ones. Expressed as an untiled
    // minor-to-major (row-major: last logical dim most minor), the
    // form jaxlib's ToLiteral path passes.
    std::vector<int64_t> minor_to_major(dim_args.num_dims);
    for (size_t i = 0; i < dim_args.num_dims; ++i) {
      minor_to_major[i] = static_cast<int64_t>(dim_args.num_dims - 1 - i);
    }
    PJRT_Buffer_MemoryLayout host_layout;
    std::memset(&host_layout, 0, sizeof(host_layout));
    host_layout.struct_size = PJRT_Buffer_MemoryLayout_STRUCT_SIZE;
    host_layout.type = PJRT_Buffer_MemoryLayout_Type_Tiled;
    host_layout.tiled.struct_size =
        PJRT_Buffer_MemoryLayout_Tiled_STRUCT_SIZE;
    host_layout.tiled.minor_to_major = minor_to_major.data();
    host_layout.tiled.minor_to_major_size = minor_to_major.size();

    PJRT_Buffer_ToHostBuffer_Args d2h;
    std::memset(&d2h, 0, sizeof(d2h));
    d2h.struct_size = PJRT_Buffer_ToHostBuffer_Args_STRUCT_SIZE;
    d2h.src = buf;
    d2h.host_layout = &host_layout;
    d2h.dst = host.data();
    d2h.dst_size = host.size();
    CHECK_NULL(api->PJRT_Buffer_ToHostBuffer(&d2h), api, "ToHostBuffer");
    AwaitAndDestroyEvent(api, d2h.event);

    int32_t dtype32 = dtype;
    int32_t rank = static_cast<int32_t>(dim_args.num_dims);
    out.write(reinterpret_cast<char*>(&dtype32), 4);
    out.write(reinterpret_cast<char*>(&rank), 4);
    out.write(reinterpret_cast<const char*>(dim_args.dims), 8 * rank);
    out.write(reinterpret_cast<char*>(host.data()), host.size());
  }
  out.close();

  for (auto& slot : out_slots) DestroyBuffer(api, slot);
  for (auto* buf : all_buffers) DestroyBuffer(api, buf);
  PJRT_LoadedExecutable_Destroy_Args exe_destroy;
  std::memset(&exe_destroy, 0, sizeof(exe_destroy));
  exe_destroy.struct_size = PJRT_LoadedExecutable_Destroy_Args_STRUCT_SIZE;
  exe_destroy.executable = exe;
  api->PJRT_LoadedExecutable_Destroy(&exe_destroy);
  PJRT_Client_Destroy_Args client_destroy;
  std::memset(&client_destroy, 0, sizeof(client_destroy));
  client_destroy.struct_size = PJRT_Client_Destroy_Args_STRUCT_SIZE;
  client_destroy.client = client;
  api->PJRT_Client_Destroy(&client_destroy);

  std::printf("ok\n");
  return 0;
}

}  // namespace

int main(int argc, char** argv) {
  const char kUsage[] =
      "usage: %s PLUGIN.so [--opt K=V]... info\n"
      "       %s PLUGIN.so [--opt K=V]... run MODULE.mlir IN.bin OUT.bin"
      " [--co OPTIONS.pb] [--repeat N] [--rotate R] [--pipeline]\n";
  if (argc < 3) {
    std::fprintf(stderr, kUsage, argv[0], argv[0]);
    return 2;
  }
  const char* plugin_path = argv[1];
  Options opts;
  int i = 2;
  while (i < argc && std::strcmp(argv[i], "--opt") == 0) {
    if (i + 1 >= argc) {
      std::fprintf(stderr, "--opt needs a KEY=VALUE argument\n");
      return 2;
    }
    ParseOpt(argv[i + 1], &opts);
    i += 2;
  }
  if (i >= argc) {
    std::fprintf(stderr, kUsage, argv[0], argv[0]);
    return 2;
  }
  const char* cmd = argv[i++];
  const PJRT_Api* api = LoadPlugin(plugin_path);
  if (std::strcmp(cmd, "info") == 0) return Info(api, opts);
  if (std::strcmp(cmd, "run") == 0) {
    if (argc - i < 3) {
      std::fprintf(stderr, kUsage, argv[0], argv[0]);
      return 2;
    }
    const char* module_path = argv[i];
    const char* input_path = argv[i + 1];
    const char* output_path = argv[i + 2];
    const char* co_path = nullptr;
    int repeat = 1;
    int rotate = 1;
    bool pipeline = false;
    int j = i + 3;
    while (j < argc) {
      if (std::strcmp(argv[j], "--co") == 0 && j + 1 < argc) {
        co_path = argv[j + 1];
        j += 2;
      } else if (std::strcmp(argv[j], "--repeat") == 0 && j + 1 < argc) {
        repeat = std::atoi(argv[j + 1]);
        j += 2;
      } else if (std::strcmp(argv[j], "--rotate") == 0 && j + 1 < argc) {
        rotate = std::atoi(argv[j + 1]);
        j += 2;
      } else if (std::strcmp(argv[j], "--pipeline") == 0) {
        pipeline = true;
        j += 1;
      } else {
        std::fprintf(stderr, "unknown argument %s\n", argv[j]);
        return 2;
      }
    }
    return Run(api, opts, module_path, input_path, output_path, co_path,
               repeat, rotate, pipeline);
  }
  std::fprintf(stderr, "unknown command\n");
  return 2;
}
