// Minimal PJRT serving host: the TF-Serving role as one C++ binary.
//
// Loads a PJRT C-API plugin (libtpu.so on TPU hosts, any CPU plugin
// elsewhere), creates a client, compiles a StableHLO computation exported
// by `recommenders_tpu.utils.export` (the `computation.stablehlo` file is
// a jax.export payload whose body is portable StableHLO MLIR), and
// executes it on f32 input buffers read from a simple binary format.
//
// Usage:
//   pjrt_host PLUGIN.so info
//       -> prints the plugin's PJRT API version and platform, attempts
//          client creation and lists devices.
//   pjrt_host PLUGIN.so run MODULE.mlir INPUT.bin OUTPUT.bin
//       -> INPUT.bin: int32 rank, int64 dims[rank], f32 data...; one
//          tensor per argument, concatenated. OUTPUT.bin mirrors it.
//
// Build: tools/build_native.sh (g++ against tensorflow's bundled
// pjrt_c_api.h; no other dependencies).
//
// Note: the exported `computation.stablehlo` from jax.export wraps the
// MLIR bytecode in a serialization envelope; `utils/export.py` also
// writes the raw MLIR alongside when `emit_mlir=True`, which is the
// format this host consumes directly.

#include <dlfcn.h>

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

int Info(const PJRT_Api* api) {
  std::printf("pjrt_api_version: %d.%d\n",
              api->pjrt_api_version.major_version,
              api->pjrt_api_version.minor_version);

  PJRT_Plugin_Initialize_Args init_args;
  init_args.struct_size = PJRT_Plugin_Initialize_Args_STRUCT_SIZE;
  init_args.extension_start = nullptr;
  CHECK_NULL(api->PJRT_Plugin_Initialize(&init_args), api,
             "PJRT_Plugin_Initialize");

  PJRT_Client_Create_Args create;
  std::memset(&create, 0, sizeof(create));
  create.struct_size = PJRT_Client_Create_Args_STRUCT_SIZE;
  CHECK_NULL(api->PJRT_Client_Create(&create), api,
             "PJRT_Client_Create");

  PJRT_Client_PlatformName_Args plat;
  std::memset(&plat, 0, sizeof(plat));
  plat.struct_size = PJRT_Client_PlatformName_Args_STRUCT_SIZE;
  plat.client = create.client;
  CHECK_NULL(api->PJRT_Client_PlatformName(&plat), api,
             "PJRT_Client_PlatformName");
  std::printf("platform: %.*s\n", static_cast<int>(plat.platform_name_size),
              plat.platform_name);

  PJRT_Client_Devices_Args devs;
  std::memset(&devs, 0, sizeof(devs));
  devs.struct_size = PJRT_Client_Devices_Args_STRUCT_SIZE;
  devs.client = create.client;
  CHECK_NULL(api->PJRT_Client_Devices(&devs), api, "PJRT_Client_Devices");
  std::printf("num_devices: %zu\n", devs.num_devices);
  return 0;
}

struct Tensor {
  std::vector<int64_t> dims;
  std::vector<float> data;
};

std::vector<Tensor> ReadTensors(const char* path) {
  std::ifstream f(path, std::ios::binary);
  std::vector<Tensor> out;
  while (f.peek() != EOF) {
    int32_t rank;
    if (!f.read(reinterpret_cast<char*>(&rank), 4)) break;
    Tensor t;
    t.dims.resize(rank);
    f.read(reinterpret_cast<char*>(t.dims.data()), 8 * rank);
    int64_t n = 1;
    for (auto d : t.dims) n *= d;
    t.data.resize(n);
    f.read(reinterpret_cast<char*>(t.data.data()), 4 * n);
    out.push_back(std::move(t));
  }
  return out;
}

int Run(const PJRT_Api* api, const char* module_path,
        const char* input_path, const char* output_path) {
  PJRT_Plugin_Initialize_Args init_args;
  init_args.struct_size = PJRT_Plugin_Initialize_Args_STRUCT_SIZE;
  init_args.extension_start = nullptr;
  CHECK_NULL(api->PJRT_Plugin_Initialize(&init_args), api,
             "PJRT_Plugin_Initialize");

  PJRT_Client_Create_Args create;
  std::memset(&create, 0, sizeof(create));
  create.struct_size = PJRT_Client_Create_Args_STRUCT_SIZE;
  CHECK_NULL(api->PJRT_Client_Create(&create), api, "PJRT_Client_Create");
  PJRT_Client* client = create.client;

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

  PJRT_Client_Compile_Args compile;
  std::memset(&compile, 0, sizeof(compile));
  compile.struct_size = PJRT_Client_Compile_Args_STRUCT_SIZE;
  compile.client = client;
  compile.program = &program;
  const char kOptions[] = "";  // Default CompileOptions proto (empty).
  compile.compile_options = kOptions;
  compile.compile_options_size = 0;
  CHECK_NULL(api->PJRT_Client_Compile(&compile), api,
             "PJRT_Client_Compile");
  PJRT_LoadedExecutable* exe = compile.executable;

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

  // Host → device buffers.
  std::vector<Tensor> inputs = ReadTensors(input_path);
  std::vector<PJRT_Buffer*> arg_buffers;
  for (auto& t : inputs) {
    PJRT_Client_BufferFromHostBuffer_Args h2d;
    std::memset(&h2d, 0, sizeof(h2d));
    h2d.struct_size = PJRT_Client_BufferFromHostBuffer_Args_STRUCT_SIZE;
    h2d.client = client;
    h2d.data = t.data.data();
    h2d.type = PJRT_Buffer_Type_F32;
    h2d.dims = t.dims.data();
    h2d.num_dims = t.dims.size();
    h2d.host_buffer_semantics =
        PJRT_HostBufferSemantics_kImmutableUntilTransferCompletes;
    h2d.device = device;
    CHECK_NULL(api->PJRT_Client_BufferFromHostBuffer(&h2d), api,
               "BufferFromHostBuffer");
    if (h2d.done_with_host_buffer) {
      PJRT_Event_Await_Args await;
      std::memset(&await, 0, sizeof(await));
      await.struct_size = PJRT_Event_Await_Args_STRUCT_SIZE;
      await.event = h2d.done_with_host_buffer;
      api->PJRT_Event_Await(&await);
      PJRT_Event_Destroy_Args edestroy;
      std::memset(&edestroy, 0, sizeof(edestroy));
      edestroy.struct_size = PJRT_Event_Destroy_Args_STRUCT_SIZE;
      edestroy.event = h2d.done_with_host_buffer;
      api->PJRT_Event_Destroy(&edestroy);
    }
    arg_buffers.push_back(h2d.buffer);
  }

  // Execute.
  PJRT_ExecuteOptions opts;
  std::memset(&opts, 0, sizeof(opts));
  opts.struct_size = PJRT_ExecuteOptions_STRUCT_SIZE;

  PJRT_Buffer** arg_list = arg_buffers.data();
  PJRT_Buffer* const* const* args_per_device =
      reinterpret_cast<PJRT_Buffer* const* const*>(&arg_list);

  // Output lists: worst case 16 outputs.
  std::vector<PJRT_Buffer*> out_slots(16, nullptr);
  PJRT_Buffer** out_list = out_slots.data();
  PJRT_Buffer*** outputs_per_device = &out_list;

  PJRT_LoadedExecutable_Execute_Args exec;
  std::memset(&exec, 0, sizeof(exec));
  exec.struct_size = PJRT_LoadedExecutable_Execute_Args_STRUCT_SIZE;
  exec.executable = exe;
  exec.options = &opts;
  exec.argument_lists = args_per_device;
  exec.num_devices = 1;
  exec.num_args = arg_buffers.size();
  exec.output_lists = outputs_per_device;
  CHECK_NULL(api->PJRT_LoadedExecutable_Execute(&exec), api, "Execute");

  // Device → host, write OUTPUT.bin.
  std::ofstream out(output_path, std::ios::binary);
  for (PJRT_Buffer* buf : out_slots) {
    if (buf == nullptr) break;
    PJRT_Buffer_Dimensions_Args dim_args;
    std::memset(&dim_args, 0, sizeof(dim_args));
    dim_args.struct_size = PJRT_Buffer_Dimensions_Args_STRUCT_SIZE;
    dim_args.buffer = buf;
    CHECK_NULL(api->PJRT_Buffer_Dimensions(&dim_args), api, "Dimensions");

    int64_t n = 1;
    for (size_t i = 0; i < dim_args.num_dims; ++i) n *= dim_args.dims[i];
    std::vector<float> host(n);

    PJRT_Buffer_ToHostBuffer_Args d2h;
    std::memset(&d2h, 0, sizeof(d2h));
    d2h.struct_size = PJRT_Buffer_ToHostBuffer_Args_STRUCT_SIZE;
    d2h.src = buf;
    d2h.dst = host.data();
    d2h.dst_size = host.size() * 4;
    CHECK_NULL(api->PJRT_Buffer_ToHostBuffer(&d2h), api, "ToHostBuffer");
    if (d2h.event) {
      PJRT_Event_Await_Args await;
      std::memset(&await, 0, sizeof(await));
      await.struct_size = PJRT_Event_Await_Args_STRUCT_SIZE;
      await.event = d2h.event;
      api->PJRT_Event_Await(&await);
    }

    int32_t rank = static_cast<int32_t>(dim_args.num_dims);
    out.write(reinterpret_cast<char*>(&rank), 4);
    out.write(reinterpret_cast<const char*>(dim_args.dims), 8 * rank);
    out.write(reinterpret_cast<char*>(host.data()), 4 * n);
  }
  std::printf("ok\n");
  return 0;
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 3) {
    std::fprintf(
        stderr,
        "usage: %s PLUGIN.so info | run MODULE.mlir IN.bin OUT.bin\n",
        argv[0]);
    return 2;
  }
  const PJRT_Api* api = LoadPlugin(argv[1]);
  if (std::strcmp(argv[2], "info") == 0) return Info(api);
  if (std::strcmp(argv[2], "run") == 0 && argc == 6) {
    return Run(api, argv[3], argv[4], argv[5]);
  }
  std::fprintf(stderr, "unknown command\n");
  return 2;
}
